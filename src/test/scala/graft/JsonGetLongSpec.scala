package graft

import graft.functions.JsonGetLong.jsonGetLong
import org.apache.spark.sql.functions._

/** Native json_get_long expression: parity with get_json_object on the
  * shared contract (bare-integer depth-1 values), the documented
  * divergences, codegen execution over a parquet scan, and type check. */
class JsonGetLongSpec extends GraftSpec {

  private def both(jsons: Seq[String]): Seq[(Option[Long], Option[Long])] = {
    val spark0 = spark
    import spark0.implicits._
    jsons.toDF("j")
      .select(jsonGetLong(col("j"), "k").as("native"),
        get_json_object(col("j"), "$.k").cast("long").as("jackson"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
  }

  test("parity with get_json_object on the shared bare-integer contract") {
    val agree = Seq(
      """{"k": 76}""",
      """{"k":-42}""",
      """{ "k" : 0 , "other": "x" }""",
      """{"a": 1, "k": 99}""",                       // key not first
      """{"a": {"k": 5}}""",                         // nested k does NOT count
      """{"a": [7, {"k": 5}], "k": 3}""",            // k inside array skipped
      """{"kk": 1, "k": 2}""",                       // no prefix confusion
      """{"a": "has \" quote and , comma", "k": 8}""", // escapes in skipped strings
      """{"other": 5}""",                            // absent
      """{}""",                                      // empty object
      """[1, 2, 3]""",                               // not an object
      """not json at all""",
      """{"k": 9223372036854775807}""",              // Long.MaxValue
      """{"k": -9223372036854775808}""")             // Long.MinValue
    both(agree).zip(agree).foreach { case ((native, jackson), j) =>
      assert(native === jackson, s"diverged on: $j")
    }
  }

  test("int64 boundary: MinValue parses, one-past either bound is null") {
    // |Long.MinValue| = Long.MaxValue + 1: the old positive accumulator
    // rejected exactly -9223372036854775808 while DuckDB's TRY_CAST
    // accepts it (round-13 advice) — pin the asymmetric bound
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq("""{"k": -9223372036854775808}""",  // MinValue: valid
      """{"k": -9223372036854775809}""",               // MinValue - 1: null
      """{"k": 9223372036854775808}""")                // MaxValue + 1: null
      .toDF("j").select(jsonGetLong(col("j"), "k")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getLong(0) === Long.MinValue)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("documented divergences: non-bare-integer values are null") {
    val spark0 = spark
    import spark0.implicits._
    // get_json_object would return these (quoted number, float truncation
    // via cast); the typed contract is bare integer or nothing
    val rows = Seq("""{"k": "76"}""", """{"k": 1.5}""", """{"k": 2e3}""",
      """{"k": true}""", """{"k": null}""", """{"k": 92233720368547758080}""")
      .toDF("j").select(jsonGetLong(col("j"), "k")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("runs inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val fixtures = Seq((1L, """{"k": 7}"""), (2L, """{"a": 1}"""), (3L, """{"k": -3}"""))
    val path = s"$tmpDir/json_codegen"
    fixtures.toDF("id", "j").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("id"), jsonGetLong(col("j"), "k").as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("json_get_long"), plan)
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val fromParquet = asMap(df.collect())
    val interpreted = asMap(fixtures.toDF("id", "j")
      .select(col("id"), jsonGetLong(col("j"), "k").as("v")).collect())
    assert(fromParquet === interpreted)
    assert(fromParquet(1L) === Some(7L) && fromParquet(2L) === None)
  }


  test("yields-int64 classification matches DuckDB json_valid semantics (probed battery)") {
    // 103 shapes evaluated against the LIVE local DuckDB 1.0.0
    // (`CASE WHEN json_valid(j) AND json_type(j, '$.k') IN
    // ('BIGINT','UBIGINT') THEN TRY_CAST(json_extract_string(j,'$.k')
    // AS BIGINT) END`) and baked as expectations — the round-18
    // whole-document-validity alignment (yyjson with trailing commas
    // + inf/nan allowed, strict strings/numbers, lowercase-exact
    // true/false/null, lone-surrogate rejection). Covers the
    // previously documented valid-prefix/malformed-tail boundary:
    // truncation, garbage tails, bad later members now yield NULL on
    // both engines.
    val spark0 = spark
    import spark0.implicits._
    val battery: Seq[(String, Option[Long])] = Seq(
      ("{\"k\":5", None),
      ("{\"k\":5}x", None),
      ("{\"k\":5,\"j\":tru}", None),
      ("{\"k\":5} ", Some(5L)),
      ("{\"k\":01}", None),
      ("{\"k\":-0}", Some(0L)),
      ("{\"k\":5.}", None),
      ("{\"k\":.5}", None),
      ("{\"k\":5e}", None),
      ("{\"k\":5e+2}", None),
      ("{\"k\":1e999}", None),
      ("{\"k\":5,}", Some(5L)),
      ("{,\"k\":5}", None),
      ("{\"k\" : 5}", Some(5L)),
      ("{\"k\":\"\\ud800\"}", None),
      ("{\"k\":\"\\ud83d\\ude00\"}", None),
      ("{\"k\":\"\\q\"}", None),
      ("{\"k\":\"a\tb\"}", None),
      ("{\"k\":\"a\\u00g1\"}", None),
      ("{\"j\":{\"a\":[1,2,{\"b\":\"x\"}]},\"k\":7}", Some(7L)),
      ("{\"j\":[1,2,,3],\"k\":7}", None),
      ("{\"k\":5  ,  \"j\":false}", Some(5L)),
      ("{\"k\":5,\"j\":truex}", None),
      ("{\"k\":+5}", None),
      ("{\"k\":9223372036854775807}", Some(9223372036854775807L)),
      ("{\"k\":9223372036854775808}", None),
      ("{\"k\":18446744073709551616}", None),
      ("5", None),
      ("[1,2]", None),
      ("{\"k\":5}\t\n ", Some(5L)),
      ("{\"k\":null,\"k\":6}", None),
      ("{\"nested\":{\"k\":9}}", None),
      ("[1,2,]", None),
      ("{\"k\":5,,}", None),
      ("[,]", None),
      ("{}", None),
      ("[]", None),
      ("   {\"k\":5}", Some(5L)),
      ("{\"k\":5 // c\n}", None),
      ("{'k':5}", None),
      ("{k:5}", None),
      ("{\"k\":NaN}", None),
      ("{\"k\":Infinity}", None),
      ("{\"k\":-Infinity}", None),
      ("{\"k\":nan}", None),
      ("{\"k\":inf}", None),
      ("{\"k\":5e+}", None),
      ("{\"k\":0e0}", None),
      ("{\"k\":-}", None),
      ("{\"k\":00}", None),
      ("{\"k\":0}", Some(0L)),
      ("{\"k\":\"\\u0041\"}", None),
      ("{\"k\":\"\\n\"}", None),
      ("{\"k\":\"\\/\"}", None),
      ("\"\"", None),
      ("true", None),
      ("null", None),
      ("", None),
      ("  ", None),
      ("{\"\":5}", None),
      ("{\"k\":[]}", None),
      ("{\"k\":{}}", None),
      ("{\"k\"5}", None),
      ("{\"k\":}", None),
      ("{\"a\":1\"k\":5}", None),
      ("{\"k\":\t5}", Some(5L)),
      ("{\"k\":5\t}", Some(5L)),
      ("{\"k\":5}{", None),
      ("{\"k\":\"\\ud800\\ud800\"}", None),
      ("{\"k\":\"\\u0000\"}", None),
      ("{\"k\":Inf}", None),
      ("{\"k\":INF}", None),
      ("{\"k\":INFINITY}", None),
      ("{\"k\":NAN}", None),
      ("{\"k\":+inf}", None),
      ("{\"k\":-inf}", None),
      ("{\"k\":-nan}", None),
      ("{\"k\":infinity}", None),
      ("{\"k\":infx}", None),
      ("{\"k\":nanx}", None),
      ("{\"k\":Infinit}", None),
      ("{\"k\":nan(123)}", None),
      ("{\"k\":\"\\udc00\"}", None),
      ("{\"k\":\"\\ud800x\"}", None),
      ("{\"k\":\"\\uD83D\\uDE00\"}", None),
      ("{\"k\":1E5}", None),
      ("{\"k\":-0.5e+10}", None),
      ("{\"k\":01.5}", None),
      ("{\"k\":NULL}", None),
      ("{\"k\":True}", None),
      ("{\"k\":FALSE}", None),
      ("{\"k\":nuLL}", None),
      ("{\"j\":-inf,\"k\":123}", Some(123L)),
      ("{\"j\":1,}", None),
      ("{\"j\":1,\"k\":5,}", Some(5L)),
      ("{\"k\":12,\"k\":99}", Some(12L)),
      ("{\"a\":\"\\ud800\\udc00\",\"k\":4}", Some(4L)),
      ("{\"k\":-9223372036854775808}", Some(-9223372036854775808L)),
      ("{\"k\":-9223372036854775809}", None),
      ("{\"a\":[],\"k\":[1],\"b\":{}}", None),
      ("{\"k\":3.0}", None),
      ("{\"k\":5, \"j\":\"tail\\\"}x\"}", Some(5L)),
      ("{\"k\":\"5\"}", None))
    val got = battery.map(_._1).toDF("j")
      .select(jsonGetLong(col("j"), "k")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    got.zip(battery).foreach { case (g, (j, exp)) =>
      assert(g === exp, s"diverged from DuckDB on: ${j}")
    }
  }

  test("rejects non-string input at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq((1L, 2L)).toDF("id", "j")
    intercept[Exception] {
      bad.select(jsonGetLong(col("j"), "k")).collect()
    }
  }
}
