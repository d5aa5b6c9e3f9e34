package graft

import graft.ops.Multimodal

/** Multimodal plumbing: the decode stub is deterministic and the typed
  * Dataset pipeline preserves every record (no-oracle op's verification). */
class MultimodalSpec extends GraftSpec {

  test("decode_stats is deterministic across runs") {
    def run() = Multimodal.decodeStats(spark, sf).collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("decode_stats covers all kinds and preserves the record count") {
    val rows = Multimodal.decodeStats(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum === 500L)
  }

  test("bytes stats match a driver-side md5") {
    val doc = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").limit(1).collect().head
    val row = Multimodal.bytesStats(spark, sf).collect().head
    assert(row.getLong(0) === doc.getLong(0))
    val bytes = doc.getString(1).getBytes("UTF-8")
    assert(row.getLong(1) === bytes.length.toLong)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(row.getString(2) === md5)
  }
}
