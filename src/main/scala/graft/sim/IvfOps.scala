package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** IVF-style approximate nearest neighbor ([EXT] X2): coarse-quantize the
  * corpus into `c` clusters, search only the `nprobe` clusters nearest to
  * each query. The complement of sign-LSH ([[VectorOps.knnLsh]]): LSH is
  * data-independent hashing, IVF adapts to the corpus via centroids.
  *
  * Centroid selection here is deterministic sampling (first `c` vectors
  * by id) — the index STRUCTURE (assignment kernel, inverted cluster
  * lists keyed for the shuffle, probe-N search) is what scales; swapping
  * in k-means centroids changes one driver-side function. Centroids are
  * tiny (c × dim doubles) and travel as a broadcast literal; the corpus
  * is never collected.
  */
object IvfOps {

  /** Deterministic centroid sample, flattened row-major. */
  def centroids(candidates: DataFrame, c: Int): Array[Double] =
    candidates.orderBy("vec_id").limit(c)
      .select("embedding").collect()
      .flatMap(_.getSeq[Float](0).map(_.toDouble))

  /** Lloyd-refined centroids: start from the deterministic sample, then
    * `iters` rounds of assign (kernel nearest-centroid, distributed) →
    * recenter (per-cluster per-dimension mean; only c×dim scalars ever
    * reach the driver). Clusters that lose all members keep their
    * previous centroid.
    */
  def kmeansCentroids(candidates: DataFrame, c: Int, iters: Int = 5): Array[Double] = {
    var cents = centroids(candidates, c)
    val dim = cents.length / c
    for (_ <- 0 until iters) {
      val flat = lit(cents)
      val means = candidates
        .withColumn("cluster",
          Kernels.ivfProbeCol(col("embedding"), flat, c, 1).getItem(0))
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy("cluster", "d").agg(avg(col("v").cast("double")).as("m"))
        .collect()
      val next = cents.clone()
      means.foreach { r =>
        next(r.getInt(0) * dim + r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }

  /** Approximate top-k: assign candidates to their nearest centroid
    * (cluster = shuffle key), probe the `nprobe` nearest clusters per
    * query, rank within the probed set. One equi-join on cluster id
    * replaces the full cross join; recall is tested against brute force.
    */
  def knnIvf(queries: DataFrame, candidates: DataFrame, k: Int,
             c: Int = 16, nprobe: Int = 4,
             centroidsFlat: Option[Array[Double]] = None): DataFrame = {
    val flat = lit(centroidsFlat.getOrElse(centroids(candidates, c)))
    val cand = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      Kernels.ivfProbeCol(col("embedding"), flat, c, 1).getItem(0).as("cluster"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      explode(Kernels.ivfProbeCol(col("embedding"), flat, c, nprobe)).as("cluster"))
    val scored = cand.join(broadcast(q), "cluster")
      .select(col("query_id"), col("neighbor_id"),
        round(Kernels.cosineFFCol(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim")
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }
}
