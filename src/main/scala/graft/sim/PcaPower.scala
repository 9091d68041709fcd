package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding column by power iteration
  * over the exact integer scatter matrix ([EXT] X2 — the
  * variance-structure half of embedding analytics: whitening checks,
  * anisotropy diagnostics, the "is one direction eating the space"
  * question every embedding pipeline asks; reference has no analytics
  * of its own, SURVEY §2.11).
  *
  * Like [[KMeansExact]], the loop is arranged so every quantity is
  * exact integer arithmetic and therefore bit-identical on any
  * partitioning or engine — the DuckDB twin (`x_pca_power`) replays
  * the whole pipeline, not a float approximation of it:
  *
  *   - inputs quantize half-up to fixed-point at [[KMeansExact.Scale]]
  *     (2^20); per-dimension means are `sum div n` (toward-zero);
  *   - the scatter S_ij = Σ_rows x_i·x_j accumulates exactly: per-row
  *     products fit a long (|x| ≤ 2^21 ⇒ product ≤ 2^42), the sum is
  *     a DECIMAL(38,0) on the Spark side and a HUGEINT in DuckDB;
  *   - power iteration runs on the driver over the dim×dim BigInt
  *     matrix (dim² scalars — the corpus never moves): w = S·v, then
  *     renormalize v ← w·Scale div max|w| (toward-zero division, which
  *     BigInt `/` and DuckDB HUGEINT `//` agree on), so the vector
  *     stays at integer magnitude ≤ Scale with no float rounding ever;
  *   - a zero matvec (constant corpus) keeps the previous vector.
  *
  * Scale shape: ONE corpus pass builds the scatter — a dim²-per-row
  * explode fanout that hash-aggregates onto dim² keys map-side (the
  * gram-matrix shape; at very large dim prefer a per-partition
  * accumulate-then-merge treeAggregate, same result by associativity
  * of integer sums). Driver cost is dim² BigInts — KB, not data.
  */
object PcaPower {

  /** `(dpos, loading)` — the power-iterated top direction at integer
    * scale [[KMeansExact.Scale]] (max |loading| = Scale exactly).
    */
  def topComponent(vectors: DataFrame, iters: Int = 3,
                   embCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._

    // fan a degenerate one-split scan out first: the dim² scatter
    // explode below multiplies every row 64×64-fold, and a single-file
    // input would run that whole expansion in one task (guide §2.5)
    val q = graft.ops.CoreOps.fanOut(vectors)
      .select(KMeansExact.quantizeCol(col(embCol)).as("qv"))
    val stats = q.select(posexplode(col("qv")).as(Seq("d", "v")))
      .groupBy("d").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect()
    val dim = stats.length
    if (dim == 0) // empty corpus → no dimensions → empty loading table
      return Seq.empty[(Long, Long)].toDF("dpos", "loading")
    val means = new Array[Long](dim)
    stats.foreach(r => means(r.getInt(0)) = r.getLong(1) / r.getLong(2))

    // ONE pass: center against the mean literal, explode (i, j) pairs,
    // exact decimal sums onto dim² keys (map-side combined).
    val centered = q.select(
      zip_with(col("qv"), lit(means), (a, b) => a - b).as("c"))
    val scatter = centered
      .select(col("c"), posexplode(col("c")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("s"))
      .collect()

    val s = Array.ofDim[BigInt](dim, dim)
    scatter.foreach { r =>
      s(r.getInt(0))(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger)
    }

    val scale = BigInt(KMeansExact.Scale)
    var v = Array.fill(dim)(scale)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += s(i)(j) * v(j); j += 1 }
        acc
      }
      val mx = w.map(_.abs).max
      if (mx != 0) v = w.map(x => x * scale / mx) // toward-zero, exact
    }

    v.zipWithIndex
      .map { case (x, d) => (d.toLong, x.toLong) }.toSeq
      .toDF("dpos", "loading")
      .orderBy("dpos")
  }
}
