package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins `Tables.events` against BOTH on-disk timestamp units.
  *
  * The driver has regenerated `/root/testdata/` with `events.ts` as
  * parquet `timestamp[ns]` in some rounds and `timestamp[us]` in others;
  * a reader that assumes one unit silently lands every event in January
  * 1970 when the other ships (the round-10 incident: 11 oracled ops red
  * from one mis-read). These tests synthesize a tiny events file in each
  * unit and assert the reader normalizes both to the same µs-precision
  * TimestampType values, plus a canary against the real testdata so the
  * next regeneration fails loudly with the footer unit in the message.
  */
class EventsTimestampUnitSpec extends GraftSpec {
  import spark.implicits._

  // 2024-03-15 12:00:00 UTC and one second later, in µs since epoch.
  private val baseUs = 1710504000000000L
  private val rows = Seq(
    (1L, baseUs, 7L, "click", 1.5, """{"k":1}"""),
    (2L, baseUs + 1000000L, 8L, "view", 2.5, """{"k":2}"""))

  /** Writes events.parquet with ts annotated TIMESTAMP(NANOS) — Spark
    * cannot write nanos, so this drops to parquet-java's example writer. */
  private def writeNanosFixture(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64).named("event_id")
      .optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
        .named("ts")
      .optional(PrimitiveTypeName.INT64).named("user_id")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(PrimitiveTypeName.DOUBLE).named("value")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us, uid, typ, v, props) =>
      writer.write(f.newGroup()
        .append("event_id", id).append("ts", us * 1000L)
        .append("user_id", uid).append("event_type", typ)
        .append("value", v).append("props", props))
    }
    writer.close()
  }

  /** Writes events.parquet with ts as TIMESTAMP_MICROS via Spark. */
  private def writeMicrosFixture(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  private def readNormalized(dir: String): Seq[(Long, Long, String)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("ns- and us-unit events files normalize to identical µs timestamps") {
    val nsDir = Files.createTempDirectory("events-ns").toString
    val usDir = Files.createTempDirectory("events-us").toString
    writeNanosFixture(nsDir)
    writeMicrosFixture(usDir)
    val fromNs = readNormalized(nsDir)
    val fromUs = readNormalized(usDir)
    val expected = rows.map(r => (r._1, r._2, r._4)).sortBy(_._1)
    assert(fromNs === expected, "nanos fixture mis-read")
    assert(fromUs === expected, "micros fixture mis-read")
    assert(Tables.events(spark, usDir).schema("ts").dataType === TimestampType)
    assert(Tables.events(spark, nsDir).schema("ts").dataType === TimestampType)
  }

  test("canary: real testdata events land in a sane year, not 1970") {
    val diskType = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val (yMin, yMax) = Tables.events(spark, sf)
      .agg(year(min("ts")), year(max("ts"))).as[(Int, Int)].head()
    assert(yMin >= 2000 && yMax <= 2100,
      s"events.ts reads as years [$yMin, $yMax] — the on-disk parquet type is " +
        s"$diskType; Tables.events is almost certainly applying the wrong " +
        "unit rescale for this testdata generation (nanos-vs-micros drift)")
  }

  test("canary: orders and lineitem dates land in sane years too") {
    // the same silent-unit-switch failure class as events: if a testdata
    // regeneration changes o_orderdate/l_shipdate physical units, every
    // TPC-H op goes red at once — this names the drift in one line
    val (oMin, oMax) = Tables.orders(spark, sf)
      .agg(year(min("o_orderdate")), year(max("o_orderdate")))
      .as[(Int, Int)].head()
    assert(oMin >= 1990 && oMax <= 2010,
      s"orders.o_orderdate reads as years [$oMin, $oMax] — check the parquet " +
        "footer unit against Tables.orders' pinned TimestampType schema")
    val (lMin, lMax) = Tables.lineitem(spark, sf)
      .agg(year(min("l_shipdate")), year(max("l_shipdate")))
      .as[(Int, Int)].head()
    assert(lMin >= 1990 && lMax <= 2010,
      s"lineitem.l_shipdate reads as years [$lMin, $lMax] — check the parquet " +
        "footer unit against Tables.lineitem's pinned TimestampType schema")
  }

  test("sniff cache invalidates when the file at the path changes") {
    // the round-11 cache keyed on path alone, so regenerating testdata
    // in-place inside a long-lived JVM served the STALE unit — exactly
    // the silent mis-read class the sniff was built to prevent; the key
    // now carries (mtime, length) so an in-place rewrite re-probes
    val usDir = Files.createTempDirectory("events-cache").toString
    writeMicrosFixture(usDir)
    assert(Tables.events(spark, usDir).schema("ts").dataType === TimestampType)
    // overwrite with a long-typed file at the same path: a fresh stat key
    // must trigger a re-probe that sees the new physical type (the reader
    // then surfaces the normalized TimestampType via the nanos branch —
    // assert on the RAW probe result by reading the footer directly)
    // no sleep: the round-13 content stamp (file count + total length +
    // max mtime) must re-probe even when the rewrite lands in the same
    // coarse-mtime second
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")
    // plain INT64 probes as LongType → the nanos branch divides by 1000:
    // seeing baseUs/1000 proves the sniff RE-PROBED; a stale micros-unit
    // cache would have applied the pinned TimestampType schema to a long
    // column instead (garbage or a read error, never this exact value)
    val us = Tables.events(spark, usDir)
      .agg(min(unix_micros(col("ts")))).as[Long].head()
    assert(us === baseUs / 1000L,
      s"expected re-probe to rescale $baseUs by 1000, got $us")
  }
}
