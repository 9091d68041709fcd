package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric path graph: the middle node out-ranks the symmetric ends") {
    // 1 - 2 - 3 (both directions): by symmetry rank(1) == rank(3),
    // and node 2 receives mass from BOTH ends each iteration
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = PageRank.ranks(edges, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(3L), "symmetric ends must rank equally")
    assert(r(2L) > r(1L), "the centre must out-rank the ends")
    // micro-grid mass is conserved up to integral-division truncation:
    // each of the 3 nodes can lose < 1000 micro-units per iteration to
    // the two div-by-1000 steps plus the per-edge division
    val total = r.values.sum
    assert(total <= PageRank.Scale &&
      total > PageRank.Scale - 3L * 3L * 2000L,
      s"mass not conserved within truncation bounds: $total")
  }

  test("ranks are deterministic across runs and partitionings") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 7 + 100L), (i % 7 + 100L, i))).toDF("src", "dst")
    val a = PageRank.ranks(edges, 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val b = PageRank.ranks(edges.repartition(17), 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(a == b, "integer-exact ranks must not depend on partitioning")
  }
}
