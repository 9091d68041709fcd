package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Pins KMeansExact's exactness contract: the Lloyd loop is pure
  * integer arithmetic, so the result is bit-identical on any
  * partitioning, and the iteration actually descends.
  */
class KMeansExactSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("assignment is total: every vector gets exactly one cluster in [0,k)") {
    val out = KMeansExact.fit(emb, k = 8, iters = 2).collect()
    assert(out.length == emb.count())
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall { r => r.getInt(1) >= 0 && r.getInt(1) < 8 })
    assert(out.forall(_.getLong(2) >= 0L))
  }

  test("partitioning-independent: repartition(7) and repartition(3) agree bit-for-bit") {
    val a = KMeansExact.fit(emb.repartition(7), k = 8, iters = 2).collect()
    val b = KMeansExact.fit(emb.repartition(3), k = 8, iters = 2).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("Lloyd descends: post-iteration inertia <= seed-assignment inertia + quantization slack") {
    def inertia(iters: Int): BigInt =
      KMeansExact.fit(emb, k = 8, iters = iters)
        .agg(sum(col("d2")).cast("decimal(38,0)")).head()
        .getDecimal(0).toBigInteger
    val seedCost = inertia(0)
    val twoCost = inertia(2)
    // truncating centroid division can cost at most 1 unit per dim per
    // row over the true mean — dwarfed by d2 magnitudes, but keep the
    // bound honest rather than asserting strict monotonicity.
    val slack = BigInt(emb.count() * 64L * 4L)
    assert(twoCost <= seedCost + slack,
      s"inertia rose: seed=$seedCost two-round=$twoCost")
    assert(twoCost < seedCost, "expected a real descent on this data")
  }

  test("more rounds converge: iters=4 inertia <= iters=2 inertia + slack") {
    def inertia(iters: Int): BigInt =
      KMeansExact.fit(emb, k = 8, iters = iters)
        .agg(sum(col("d2")).cast("decimal(38,0)")).head()
        .getDecimal(0).toBigInteger
    val slack = BigInt(emb.count() * 64L * 4L)
    assert(inertia(4) <= inertia(2) + slack)
  }
}
