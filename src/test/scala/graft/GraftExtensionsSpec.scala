package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MinHashSig.minhash
import graft.functions.MinShingleMd5.minShingleMd5
import graft.functions.NgramHashes.ngramHashes
import graft.functions.SimHash64.simhash64

/** SQL registration of the native expressions via GraftExtensions:
  * name resolution, SQL↔Column parity, codegen survival through the SQL
  * parser path, literal-argument validation, and per-session scoping.
  *
  * getOrCreate returns the active session and silently ignores a new
  * builder's extensions, so the suite clears active/default, builds one
  * extension-bearing session over the SHARED SparkContext, and restores
  * the fixture session in a finally — other suites in this (potentially
  * parallel) test JVM address their session explicitly, never through the
  * default, so the brief swap is invisible to them.
  */
class GraftExtensionsSpec extends GraftSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force the lazy fixture first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate())
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("all seven functions resolve by name and match their Column twins") {
    withExtSession { s =>
      val sqlRow = s.sql(
        """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |       minhash_sig(array('a', 'b', 'c'), 4)              AS mh,
          |       json_get_long('{"a": 1, "k": 76}', 'k')           AS jl,
          |       min_shingle_md5('abcdefgh', 3)                    AS ms,
          |       ngram_hashes('a b c d', 2)                        AS ng,
          |       simhash64(array('a', 'b', 'c'))                   AS sh,
          |       token_entropy('a b c d').entropy                  AS te
          |""".stripMargin).collect().head
      assert(sqlRow.getDouble(0) === 11.0)
      assert(sqlRow.getLong(2) === 76L)
      assert(sqlRow.getDouble(6) === 2.0)
      // Column-API twins on the same inputs (no registry involved)
      val colRow = s.range(1).select(
        minhash(array(lit("a"), lit("b"), lit("c")), 4).as("mh"),
        minShingleMd5(lit("abcdefgh"), 3).as("ms"),
        ngramHashes(lit("a b c d"), 2).as("ng"),
        simhash64(array(lit("a"), lit("b"), lit("c"))).as("sh")).collect().head
      assert(sqlRow.getSeq[Long](1) === colRow.getSeq[Long](0))
      assert(sqlRow.getString(3) === colRow.getString(1))
      assert(sqlRow.getSeq[Long](4) === colRow.getSeq[Long](2))
      assert(sqlRow.getSeq[Long](4).length === 3)
      assert(sqlRow.getLong(5) === colRow.getLong(3))
    }
  }

  test("SQL-path expressions execute inside whole-stage codegen") {
    withExtSession { s =>
      import s.implicits._
      // Through a parquet scan: a purely-local relation would be
      // constant-folded by ConvertToLocalRelation and never reach codegen.
      val path = s"$tmpDir/ext_codegen"
      Seq("""{"k": 7}""", """{"k": -3}""").toDF("j")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path).createOrReplaceTempView("jv")
      val df = s.sql("SELECT json_get_long(j, 'k') AS v FROM jv")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project") && plan.contains("json_get_long"), plan)
      assert(df.collect().map(_.getLong(0)).sorted === Array(-3L, 7L))
    }
  }

  test("codegen-parameterizing arguments must be literals; arity is checked") {
    withExtSession { s =>
      import s.implicits._
      Seq(("x", 2)).toDF("t", "w").createOrReplaceTempView("bad")
      val nonLiteral = intercept[Exception] {
        s.sql("SELECT min_shingle_md5(t, w) FROM bad").collect()
      }
      assert(nonLiteral.getMessage.contains("integer literal"), nonLiteral.getMessage)
      val wrongArity = intercept[Exception] {
        s.sql("SELECT json_get_long('{}')").collect()
      }
      assert(wrongArity.getMessage.contains("2 arguments"), wrongArity.getMessage)
    }
  }

  test("registration is scoped to the extension session, not the JVM") {
    withExtSession { _ => () } // ensure the names exist in SOME session
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0d), array(1.0d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("unresolved"), e.getMessage)
  }
}
