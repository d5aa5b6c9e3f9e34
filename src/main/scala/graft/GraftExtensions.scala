package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharNgrams, DotProduct, JsonGetLong, MinHashSig, MinShingleMd5, NgramHashes, SimHash64, TokenEntropy, WavMeta}

/** SQL surface for the library's native Catalyst expressions.
  *
  * The Column entry points (`DotProduct.dot`, `MinHashSig.minhash`, …)
  * cover DataFrame callers; this extension closes the other half of the
  * extensibility story: a pure-SQL user (`spark.sql`, thrift, notebook
  * `%%sql`) gets the same codegen'd expressions by name, with no Scala
  * import. Activate per session:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions (config / cluster-wide)
  * }}}
  *
  * Each builder validates its non-data arguments at ANALYSIS time — the
  * tuning knobs (hash count, key, shingle width) parameterize codegen, so
  * they must be foldable literals, and a clear analysis error beats a
  * ClassCastException out of the planner. Registration is per-session
  * state: injecting the same names into two sessions is safe, and nothing
  * here mutates the global built-in registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
    // the bounded-edit-distance rewrite (§2.10 Rule surface) — runs with
    // the operator-optimization batch so constant folding has already
    // reduced the bound to a literal
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
  }
}

object GraftExtensions {

  /** (name, usage-doc, builder) for every native expression. */
  private[graft] val all: Seq[(String, String, FunctionBuilder)] = Seq(
    ("dot_product",
      "dot_product(a, b) - dot product of two array<double> columns",
      args => { expectArity("dot_product", args, 2)
        DotProduct(args(0), args(1)) }),
    ("minhash_sig",
      "minhash_sig(tokens, k) - k-hash MinHash signature of array<string>",
      args => { expectArity("minhash_sig", args, 2)
        MinHashSig(args(0), intLiteral("minhash_sig", "k", args(1))) }),
    ("json_get_long",
      "json_get_long(json, key) - top-level integer member of a JSON string",
      args => { expectArity("json_get_long", args, 2)
        JsonGetLong(args(0), stringLiteral("json_get_long", "key", args(1))) }),
    ("min_shingle_md5",
      "min_shingle_md5(text, width) - min MD5 over width-char shingles",
      args => { expectArity("min_shingle_md5", args, 2)
        MinShingleMd5(args(0), intLiteral("min_shingle_md5", "width", args(1))) }),
    ("ngram_hashes",
      "ngram_hashes(text, n) - distinct xxhash64 of the word n-grams",
      args => { expectArity("ngram_hashes", args, 2)
        NgramHashes(args(0), intLiteral("ngram_hashes", "n", args(1))) }),
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash fingerprint of array<string>",
      args => { expectArity("simhash64", args, 1)
        SimHash64(args(0)) }),
    ("token_entropy",
      "token_entropy(text) - struct(entropy, n_tokens) of the space-split tokens",
      args => { expectArity("token_entropy", args, 1)
        TokenEntropy(args(0)) }),
    ("wav_meta",
      "wav_meta(bytes) - struct(sample_rate, channels, bits, n_frames, " +
        "duration_ms) of a RIFF/WAVE blob, null if malformed",
      args => { expectArity("wav_meta", args, 1)
        WavMeta(args(0)) }),
    ("char_ngrams",
      "char_ngrams(text, n) - array of every width-n character window",
      args => { expectArity("char_ngrams", args, 2)
        CharNgrams(args(0), intLiteral("char_ngrams", "n", args(1))) }))

  private def expectArity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def intLiteral(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal (it parameterizes codegen), got: ${other.sql}")
  }

  private def stringLiteral(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v: UTF8String, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal (it parameterizes codegen), got: ${other.sql}")
  }
}
