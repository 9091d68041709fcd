package graft.ops

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetrize an undirected edge list for the operator's input
    * contract (symmetric, distinct, no self-loops).
    */
  private def sym(es: Seq[(Long, Long)]) =
    (es ++ es.map(_.swap)).distinct.toDF("src", "dst")

  test("counts each triangle at all three corners, exactly once") {
    // K4 on {1,2,3,4}: 4 triangles, each vertex in exactly 3
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val out = Triangles.topVerticesByTriangles(sym(k4), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle-free graph yields no rows") {
    // a 6-cycle has no triangles
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6))
    assert(Triangles.topVerticesByTriangles(sym(cycle), 10).count() == 0)
  }

  test("skewed star plus one closing edge: only the closed wedge counts") {
    // star center 0 with leaves 1..100 (celebrity node), plus edge
    // (1,2): exactly one triangle {0,1,2}. The degree-ordered
    // orientation points every star edge AWAY from the high-degree
    // center, so wedge fan-out at the center is zero — the naive
    // src<dst orientation would enumerate ~100²/2 wedges here.
    val star = (1L to 100L).map(l => (0L, l)) :+ (1L, 2L)
    val out = Triangles.topVerticesByTriangles(sym(star), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("sampleEdges keeps both directions of an undirected edge or neither") {
    val es = (1L to 400L).map(i => (i, i + 1000L))
    val g = sym(es)
    val kept = Triangles.sampleEdges(g, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept.nonEmpty && kept.size < g.count(),
      s"sampling kept ${kept.size} of ${g.count()}")
    // symmetric closure: (u,v) kept ⇒ (v,u) kept
    assert(kept.forall { case (u, v) => kept.contains((v, u)) })
    // deterministic: a second evaluation keeps the identical set
    val kept2 = Triangles.sampleEdges(g, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == kept2)
  }

  test("top-k truncation is deterministic under count ties") {
    // two disjoint triangles; k=4 must keep the 4 smallest ids at n=1
    val tris = Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 8L), (8L, 9L), (7L, 9L))
    val out = Triangles.topVerticesByTriangles(sym(tris), 4)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L, 7L))
  }
}
