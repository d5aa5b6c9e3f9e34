package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.SimHash64.simhash64

/** Native simhash64 expression (md5 token hashing since round 12):
  * bit-parity with the explode + 64-conditional-sum aggregate stack over
  * the same md5 hex-half arithmetic the DuckDB oracle uses, plus
  * null-token handling, codegen execution, and the type check. */
class SimHash64Spec extends GraftSpec {

  /** The declarative column form this expression must match: per-token
    * ±1 votes per bit, token hash = first 16 hex chars of md5 split into
    * two 32-bit halves (hi = chars 1..8 → bits 63..32, lo = chars 9..16
    * → bits 31..0) — the exact DuckDB oracle spelling. A null token's
    * bit is null, so its vote is skipped by sum (both when-branches
    * miss), matching the native null-skip. */
  private def referenceSimhash(docToks: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val tok = docToks.select(col("doc_id"), explode(col("toks")).as("tok"))
    val hi: Column = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val lo: Column = conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long")
    val votes = (0 until 64).map { b =>
      val bit =
        if (b < 32) shiftright(lo, b).bitwiseAND(lit(1L))
        else shiftright(hi, b - 32).bitwiseAND(lit(1L))
      sum(when(bit === 1, 1).when(bit === 0, -1)).as(s"bit$b")
    }
    tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          shiftleft(when(col(s"bit$b") > 0, lit(1L)).otherwise(lit(0L)), b))
          .reduce(_ bitwiseOR _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bit-parity with the explode + 64-agg md5 column stack, incl. null tokens") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    val fixtures: Seq[(Long, Seq[Option[String]])] =
      Seq(
        1L -> Seq(Some("a")),
        2L -> Seq(Some("a"), Some("a"), Some("b")),    // frequency-weighted
        3L -> Seq(Some(""), Some("x")),                // empty token hashes too
        4L -> Seq(Some("héllo"), Some("漢字")),         // multi-byte UTF-8
        5L -> Seq(None, Some("y"))                     // null token skipped
      ) ++ (6L to 30L).map(id => id ->
        Seq.fill(1 + rnd.nextInt(40))(Some(s"w${rnd.nextInt(12)}")))
    val docToks = fixtures.toDF("doc_id", "toks")
    val native = docToks.select(col("doc_id"), simhash64(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === referenceSimhash(docToks))
  }

  test("executes inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/simhash_codegen"
    Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("doc_id", "toks")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("doc_id"), simhash64(col("toks")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("simhash64"), plan)
    val fromParquet = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("doc_id", "toks")
      .select(col("doc_id"), simhash64(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromParquet === local)
  }

  test("identical token arrays share a fingerprint; disjoint ones differ") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(Seq("x", "y", "z"), Seq("x", "y", "z"), Seq("p", "q", "r"))
      .toDF("toks").select(simhash64(col("toks"))).collect().map(_.getLong(0))
    assert(rows(0) === rows(1))
    assert(rows(0) !== rows(2))
  }

  test("rejects non-array input at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    intercept[Exception] {
      Seq("t").toDF("toks").select(simhash64(col("toks"))).collect()
    }
  }
}
