package graft

import org.apache.spark.sql.functions._

/** Native word_ngrams vs the exact column stack it replaced, over real
  * corpus docs and the contract's edge shapes. */
class WordNgramsSpec extends GraftSpec {

  private def stack(n: Int) = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  test("word_ngrams ≡ the filter/slice/array_join/array_distinct stack") {
    val spark0 = spark
    import spark0.implicits._
    val edges = Seq(
      "",                      // no tokens -> empty
      "   ",                   // only separators -> empty
      "one two three four",    // fewer than n tokens -> empty (n=5)
      "a b c d e",             // exactly one gram
      "a  b c   d e f g",      // multi-space runs: filtered AND joined
      " lead and trail pad x y z ",
      "dup dup dup dup dup dup dup dup",  // within-doc duplicate grams
      "café über naïve schön groß émile rené øre")
    val real = Tables.documents(spark, sf).select(lower(col("text")).as("text"))
      .orderBy(rand(7)).limit(40).collect().map(_.getString(0)).toSeq
    val df = (edges ++ real).toDF("text")
    val rows = df.select(
        graft.functions.WordNgrams.wordNgrams(col("text"), 5).as("native"),
        stack(5).as("ref"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"text #$i")
    }
  }
}
