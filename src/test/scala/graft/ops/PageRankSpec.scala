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

  test("a held, unevaluated result survives a second ranks() call") {
    // per-invocation scratch dirs: ranks() returns a lazy reader, so a
    // second call on a DIFFERENT graph must not overwrite the files
    // underneath the first result
    val g1 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val g2 = (1L to 20L).flatMap(i => Seq((i, i + 100L), (i + 100L, i)))
      .toDF("src", "dst")
    val r1 = PageRank.ranks(g1, 2)          // NOT collected yet
    val r2 = PageRank.ranks(g2, 2).collect()
    val got1 = r1.collect()                 // evaluated after the 2nd call
    assert(got1.map(_.getLong(0)).toSet == Set(1L, 2L),
      "first result must still read the FIRST graph's ranks")
    assert(r2.length == 40)
  }

  test("empty edge input yields an empty (id, rank) frame, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val r = PageRank.ranks(empty, 3)
    assert(r.columns.toSeq == Seq("id", "rank"))
    assert(r.count() == 0)
  }
}
