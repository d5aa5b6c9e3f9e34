package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Degenerate aggregate groups — constant column / single-row group —
  * must yield DuckDB's semantics on every stats-family function the
  * registry ships, never an ANSI DIVIDE_BY_ZERO (SURVEY §7.5 round-13
  * note, retired round 14). Expected values pinned from a DuckDB probe
  * this round:
  *
  * |                | const column (2 rows) | single row |
  * | corr           | NULL                  | NULL       |
  * | covar_samp     | 0.0                   | NULL       |
  * | stddev_samp    | 0.0                   | NULL       |
  * | var_samp       | 0.0                   | NULL       |
  * | skewness       | NULL                  | NULL       |
  * | kurtosis       | NULL                  | NULL       |
  * | regr_slope/intercept/r2 | NULL         | NULL       |
  *
  * Everything but `corr` already agreed engine-to-engine; native corr
  * THROWS on zero variance under ANSI, so the ops ship
  * [[Relational.safeCorr]] (try_divide over corr's own sufficient
  * statistics) and this spec guards both halves: degenerate → NULL,
  * real data → 4-dp-identical to native corr.
  */
class DegenerateStatsSpec extends GraftSpec {

  private def agg1(df: org.apache.spark.sql.DataFrame,
                   c: org.apache.spark.sql.Column): Option[Double] = {
    val r = df.agg(c).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("constant column and single-row groups: NULL/0.0, never DIVIDE_BY_ZERO") {
    val spark0 = spark
    import spark0.implicits._
    val const2 = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    val one = Seq((1.0, 2.0)).toDF("x", "y")
    // the one previously-throwing case, both orientations
    assert(agg1(const2, Relational.safeCorr(col("x"), col("y"))) === None)
    assert(agg1(const2, Relational.safeCorr(col("y"), col("x"))) === None)
    assert(agg1(one, Relational.safeCorr(col("x"), col("y"))) === None)
    // the rest of the family already carries DuckDB semantics natively —
    // pin it so an engine upgrade or regen cannot drift silently
    assert(agg1(const2, covar_samp(col("x"), col("y"))) === Some(0.0))
    assert(agg1(const2, stddev_samp(col("x"))) === Some(0.0))
    assert(agg1(const2, var_samp(col("x"))) === Some(0.0))
    assert(agg1(const2, skewness(col("x"))) === None)
    assert(agg1(const2, kurtosis(col("x"))) === None)
    assert(agg1(const2, regr_slope(col("y"), col("x"))) === None)
    assert(agg1(const2, regr_intercept(col("y"), col("x"))) === None)
    assert(agg1(const2, regr_r2(col("y"), col("x"))) === None)
    for (c <- Seq(covar_samp(col("x"), col("y")), stddev_samp(col("x")),
        var_samp(col("x")), skewness(col("x")), kurtosis(col("x")),
        regr_slope(col("y"), col("x")), regr_intercept(col("y"), col("x")),
        regr_r2(col("y"), col("x"))))
      assert(agg1(one, c) === None)
  }

  test("safeCorr equals native corr at the 4-dp surface on real data") {
    // the re-spelling shares Corr's Welford accumulation via
    // covar_pop/stddev_pop, so only final-step rounding order differs —
    // assert it never reaches the oracle's 4-dp precision, per group and
    // per measure pair
    val li = Tables.lineitem(spark, sf)
    val pairs = Seq(
      ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
      ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
      ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
    val aggs = pairs.flatMap { case (a, b) => Seq(
      round(Relational.safeCorr(col(a), col(b)), 4).as(s"s_${a}_$b"),
      round(corr(col(a), col(b)), 4).as(s"n_${a}_$b")) }
    val rows = li.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      pairs.indices.foreach { i =>
        assert(r.getDouble(1 + 2 * i) === r.getDouble(2 + 2 * i),
          s"pair ${pairs(i)} flag ${r.getString(0)}")
      }
    }
  }
}
