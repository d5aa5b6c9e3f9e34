package graft

/** Wiring guards for the harness contract: every registered query must
  * ANALYZE against the real testdata (catches renamed columns, bad
  * expressions and registry typos at plan time without executing 142
  * queries), and the three registries must stay mutually consistent.
  * Full execution coverage lives in Verify + the driver's oracle; this
  * spec is the fast tripwire that fails inside `sbt test` the moment a
  * refactor breaks an op's analysis. */
class RegistrySpec extends GraftSpec {

  test("every registered query analyzes against sf0.001") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, sf).schema; None }
        catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("oracleSql keys are a subset of queries; benchQueries all resolve") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty, s"oracles without a query: $orphanOracles")
    val orphanBench = SparkEntry.benchQueries.toSet -- qs
    assert(orphanBench.isEmpty, s"bench entries without a query: $orphanBench")
    assert(SparkEntry.benchQueries.distinct.size === SparkEntry.benchQueries.size,
      "benchQueries must not contain duplicates")
  }

  test("no Map literal in SparkEntry defines a key twice") {
    // Scala Map literals silently keep the LAST duplicate key, so a
    // repeated entry makes earlier edits vanish without any warning
    // (round 11 shipped a ~95-line doubled oracleSql block that was
    // harmless only because both copies were identical). The compiled
    // Maps can't show the duplication, so count `"key" ->` bindings in
    // each def's SOURCE region and compare against the runtime size.
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val binding = """^\s+"([a-z0-9_]+)"\s*->""".r
    def regionKeys(defName: String): Seq[String] = {
      val start = lines.indexWhere(_.contains(s"def $defName"))
      assert(start >= 0, s"def $defName not found in SparkEntry source")
      val end = lines.indexWhere(_.trim.startsWith("def "), start + 1)
      lines.slice(start, if (end < 0) lines.size else end)
        .flatMap(binding.findFirstMatchIn(_)).map(_.group(1))
    }
    for (d <- Seq("queries", "oracleSql")) {
      val keys = regionKeys(d)
      val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
      assert(dups.isEmpty, s"$d binds keys more than once: $dups")
    }
  }

  test("every oracled query is benched (the budget covers the whole contract)") {
    // the round-trip fingerprints are oracled but deliberately unbenched:
    // they write+re-read files, which the repeated-materialization timing
    // methodology can't time meaningfully, and BASELINE.md never budgeted
    // them — any OTHER gap here is a forgotten benchQueries entry
    val sinkOps = Set("csv_roundtrip_fingerprint", "json_roundtrip_fingerprint")
    val unbenched =
      SparkEntry.oracleSql.keySet -- SparkEntry.benchQueries.toSet -- sinkOps
    assert(unbenched.isEmpty,
      s"oracled but missing from benchQueries: ${unbenched.toSeq.sorted}")
  }
}
