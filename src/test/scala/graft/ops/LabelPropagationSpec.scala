package graft.ops

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  // path graph 1-2-3-4-5, symmetric edges
  private def pathEdges = {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    (e ++ e.map(_.swap)).toDF("src", "dst")
  }

  test("two deterministic rounds on a path graph (hand-computed)") {
    val out = LabelPropagation.communities(pathEdges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1 (min neighbor id): 1->2, 2->1, 3->2, 4->3, 5->4
    // r2 (majority, ties to smallest): 1->1, 2->2, 3->1, 4->2, 5->3
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L), s"got $out")
  }

  test("partitioning-independent") {
    val a = LabelPropagation.communities(pathEdges.repartition(5), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = LabelPropagation.communities(pathEdges.repartition(2), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
