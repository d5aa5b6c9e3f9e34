package graft

import graft.ops.Privacy

/** Masking invariants: determinism, irreversibility of the redacted
  * fields, and survival of the recon-relevant columns. */
class PrivacySpec extends GraftSpec {

  test("maskCustomers: deterministic, redacting, recon-compatible") {
    val orig = Tables.customer(spark, sf).orderBy("c_custkey").limit(200)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(3), r.getString(4)))).toMap
    val masked = Privacy.maskCustomers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(masked.length === orig.size)
    masked.foreach { case (k, name, bucket, seg) =>
      val (origName, origBal, origSeg) = orig(k)
      // initial survives, everything else is stars, length preserved
      assert(name.head === origName.head && name.length === origName.length)
      assert(name.tail.forall(_ === '*'), name)
      // balance generalized to its hundreds bucket
      assert(bucket % 100 === 0 && bucket <= origBal && origBal < bucket + 100)
      // key and segment untouched (the recon join surface)
      assert(seg === origSeg)
    }
    // re-run is bit-identical (a nondeterministic mask would break the
    // masked-replica recon story)
    assert(Privacy.maskCustomers(spark, sf).collect().toSeq
      === Privacy.maskCustomers(spark, sf).collect().toSeq)
  }
}
