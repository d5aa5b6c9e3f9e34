package graft

import graft.functions.WavMeta.wavMeta
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WAV header scanner: field extraction, chunk walking, malformed
  * rejection, codegen execution, and the corpus-profile op. */
class WavMetaSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  /** Hand-build a RIFF/WAVE blob; extraChunk injects a (id, body) chunk
    * between fmt and data to exercise the chunk walk. */
  private def wav(rate: Int, channels: Int, bits: Int, frames: Int,
                  extraChunk: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataLen = frames * blockAlign
    val extra = extraChunk.map { case (_, b) => 8 + b.length + (b.length & 1) }.getOrElse(0)
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + extra + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1.toShort)
      .putShort(channels.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    extraChunk.foreach { case (id, b) =>
      bb.put(id.getBytes).putInt(b.length).put(b)
      if ((b.length & 1) == 1) bb.put(0.toByte)   // word-aligned padding
    }
    bb.put("data".getBytes).putInt(dataLen).put(new Array[Byte](dataLen))
    bb.array()
  }

  private def parse(b: Array[Byte]) = graft.functions.WavScan.parse(b)

  test("extracts rate/channels/bits/frames/duration from a clean header") {
    val r = parse(wav(44100, 2, 16, 44100 * 3))
    assert(r != null)
    assert(r.getInt(0) === 44100 && r.getInt(1) === 2 && r.getInt(2) === 16)
    assert(r.getLong(3) === 44100L * 3)
    assert(r.getLong(4) === 3000L, "3 s of frames at 44.1 kHz")
  }

  test("walks past a LIST chunk (odd size, padded) ahead of data") {
    val r = parse(wav(8000, 1, 16, 800,
      extraChunk = Some(("LIST", Array[Byte](73, 78, 70, 79, 1)))))
    assert(r != null && r.getInt(0) === 8000 && r.getLong(3) === 800L)
  }

  test("rejects malformed blobs: magic, truncation, inconsistent rates") {
    val good = wav(16000, 1, 16, 100)
    assert(parse("notawave".getBytes ++ good.drop(8)) == null, "bad magic")
    assert(parse(good.take(30)) == null, "truncated chunk list")
    val badRate = good.clone()
    badRate(29) = (badRate(29) ^ 1).toByte   // flip a byte_rate bit
    assert(parse(badRate) == null, "byte_rate cross-check must catch corruption")
    assert(parse(Array.emptyByteArray) == null)
  }

  test("runs inside whole-stage codegen; generated and interpreted paths agree") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, wav(44100, 2, 16, 441)), (2L, wav(8000, 1, 16, 80)),
      (3L, "junk".getBytes))
    // a local relation folds the projection at plan time — write through
    // parquet so the expression runs in a real scan's codegen stage
    val path = java.nio.file.Files.createTempDirectory("graft-wav").toString
    rows.toDF("id", "wav").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("id"), wavMeta(col("wav")).as("m"))
      .select(col("id"), col("m.sample_rate"), col("m.duration_ms"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) ") && plan.contains("wav_meta"), plan)
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2))))).toMap
    assert(got === Map(1L -> Some((44100, 10L)), 2L -> Some((8000, 10L)), 3L -> None))
    // interpreted path (no codegen) must agree bit-for-bit
    val interp = rows.map { case (id, b) => id -> Option(parse(b)).map(r => (r.getInt(0), r.getLong(4))) }.toMap
    assert(got === interp)
  }

  test("wavMetaStats: cohort profile equals a local recount of the synthesized corpus") {
    val got = Multimodal.wavMetaStats(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val rate = Array(8000, 16000, 44100)((id % 3).toInt)
      val channels = 1 + (id % 2).toInt
      val blockAlign = channels * 2
      val frames = text.getBytes("UTF-8").length / blockAlign.toLong
      ((rate, channels), (frames, frames * 1000 / rate))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    assert(got === expect)
    assert(got.keys.toSet === Set((8000, 1), (8000, 2), (16000, 1), (16000, 2),
      (44100, 1), (44100, 2)))
  }
}
