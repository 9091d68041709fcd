package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** SemDeDup-shaped semantic dedup: cluster on broadcast centroids, drop
  * within-cluster cosine near-dups (sim/SemDedup.scala). Pins the keep
  * policy (min-id survives, drops need a SAME-cluster witness), the
  * consistency of the verdict with the exact all-pairs dup surface, and
  * the loud cluster-size refusal.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact duplicates collapse to the min-id representative") {
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val w = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq((10L, v), (20L, v), (30L, w), (40L, v))
      .toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(df, c = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(10L) == 1L, "smallest id of the dup group must survive")
    assert(out(20L) == 0L && out(40L) == 0L, "later copies are dropped")
    assert(out(30L) == 1L, "orthogonal vector is untouched")
  }

  test("an empty corpus yields an empty verdict, not an NPE") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // max over zero groups is a null cell — the cluster-size guard must
    // treat that as "nothing too big", and the centroid seed must be
    // injectable since there is nothing to sample
    assert(SemDedup.semDedup(empty, c = 2, tau = 0.9,
      centroidsFlat = Some(Array.fill(2 * 4)(0.0))).count() == 0L)
  }

  test("a near-dup pair split across clusters is NOT dropped (by design)") {
    // two identical vectors, but centroids chosen so each is its own
    // cluster seed: semdedup only prunes within a cluster — the
    // cross-cluster miss is the documented recall cost of bounding the
    // quadratic (the paper's tradeoff), not a bug.
    val v = Seq(1.0f, 0.0f)
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val cents = Array(1.0, 0.0, 1.0, 0.0) // duplicate centroids: ties
    val out = SemDedup.semDedup(df, c = 2, tau = 0.9,
      centroidsFlat = Some(cents))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // tie-break assigns BOTH to cluster 0 (first-tie-wins) → same
    // cluster → the dup IS found; this pins the tie-break direction
    assert(out(1L) == 1L && out(2L) == 0L)
  }

  test("verdict agrees with the exact dup-pair surface inside each cluster") {
    val emb = Tables.embeddings(spark, sf)
    val cents = IvfOps.hashSampleCentroids(emb, 8)
    val out = SemDedup.semDedup(emb, c = 8, tau = 0.4,
      centroidsFlat = Some(cents))
    // recompute: dropped iff some smaller-id same-cluster vec at >=tau
    val flat = lit(cents)
    val assigned = emb.select(col("vec_id"),
      graft.functions.Kernels.ivfProbeCol(col("embedding"), flat, 8, 1)
        .getItem(0).cast("long").as("cluster"), col("embedding"))
    val a = assigned.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("a_e"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("b_e"))
    val expectDropped = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id") &&
        round(graft.functions.Kernels.cosineFFCol(col("a_e"), col("b_e")), 4) >= 0.4)
      .select(col("b_id")).distinct().as[Long].collect().toSet
    val got = out.filter(col("kept") === 0L).select("vec_id")
      .as[Long].collect().toSet
    assert(got == expectDropped)
    assert(out.count() == emb.count(), "one verdict row per vector")
  }

  test("oversized cluster refuses loudly") {
    val v = Seq(1.0f, 0.0f)
    val df = (1L to 50L).map(i => (i, v)).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      SemDedup.semDedup(df, c = 1, tau = 0.99, maxClusterRows = 10L)
    }
    assert(e.getMessage.contains("maxClusterRows"))
  }
}
