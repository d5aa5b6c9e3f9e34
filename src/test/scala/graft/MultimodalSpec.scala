package graft

import graft.ops.{MediaFeatures, Multimodal}

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

  test("resize clamps every dimension to the target box") {
    val rows = Multimodal.resizeStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) <= 32 && r.getInt(3) <= 32,
        s"${r.getString(0)}: ${r.getInt(2)}x${r.getInt(3)} exceeds 32")
    }
    // aspect-ratio arithmetic spot check
    val f = Multimodal.resizeStub(
      MediaFeatures(1L, "image", 100L, 64, 32, 1), maxSide = 32)
    assert(f.width === 32 && f.height === 16)
  }

  test("frame sampling emits ceil(frames/stride) rows per video") {
    val videos = Multimodal.mediaRecords(spark, sf)
      .collect().filter(_.kind == "video")
      .map(Multimodal.decodeStub)
      .map(f => f.doc_id -> (f.frames + 9) / 10).toMap
    val got = Multimodal.frameSample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === math.min(videos.size, 500))
    got.foreach { case (id, n) => assert(n === videos(id).toLong, s"doc $id") }
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
