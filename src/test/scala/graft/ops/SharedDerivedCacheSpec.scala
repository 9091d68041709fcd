package graft.ops

import graft.SparkSpec

/** Pins the bench-billing contract of the shared derived-table caches
  * (`Queries.prepPartsupp`, `ExtQueries.prepNeardupComponents`,
  * `ExtQueries.prepBpeMerges`): a prep call drops the per-JVM memo and
  * re-materializes the table in full, and the re-materialized result is
  * identical to the cached one — so Bench's `prep_*` lines time the real
  * derivation and the consuming queries can safely report marginal cost
  * under the warm cache.
  */
class SharedDerivedCacheSpec extends SparkSpec {

  /** Deterministic content signature of a query result. */
  private def sig(name: String): Seq[String] = {
    val df = graft.Queries.queries(name)(spark, sf)
    df.collect().map(_.toString).toSeq.sorted
  }

  test("prepPartsupp re-materializes to identical content") {
    val before = sig("q_tpch_q11")
    graft.Queries.prepPartsupp(spark, sf)
    assert(sig("q_tpch_q11") == before)
    // a second prep must also be safe (idempotent under repeated billing)
    graft.Queries.prepPartsupp(spark, sf)
    assert(sig("q_tpch_q11") == before)
  }

  test("prepNeardupComponents re-materializes to identical content") {
    val before = sig("x_dedup_clusters")
    graft.ExtQueries.prepNeardupComponents(spark, sf)
    assert(sig("x_dedup_clusters") == before)
  }

  test("prepBpeMerges re-materializes to identical content") {
    val before = sig("x_bpe_train")
    graft.ExtQueries.prepBpeMerges(spark, sf)
    assert(sig("x_bpe_train") == before)
  }

  test("prepCoPurchaseEdges re-materializes to identical content for both graph queries") {
    val beforeRank = sig("x_pagerank")
    val beforeComm = sig("x_label_prop")
    graft.ExtQueries.prepCoPurchaseEdges(spark, sf)
    assert(sig("x_pagerank") == beforeRank)
    assert(sig("x_label_prop") == beforeComm)
  }

  test("re-materialization never overwrites a published path") {
    // lazily-read results captured BEFORE a prep must keep serving the
    // original data afterwards: scratchDirUnique gives every
    // materialization its own directory, so an unevaluated plan over the
    // old path cannot be silently re-pointed at different files
    val stale = graft.Queries.queries("q_tpch_q11")(spark, sf)
    val before = stale.collect().map(_.toString).toSeq.sorted
    graft.Queries.prepPartsupp(spark, sf)
    assert(stale.collect().map(_.toString).toSeq.sorted == before)
  }
}
