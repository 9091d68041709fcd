package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** Semantic (embedding-space) deduplication ([EXT] X1/X2 bridge): the
  * cluster-then-prune shape of SemDeDup (Abbas et al., 2023,
  * arXiv:2303.09540) — coarse-cluster the corpus on broadcast
  * centroids, then drop near-duplicates WITHIN each cluster by exact
  * cosine, so the quadratic pair work is bounded per cluster instead of
  * corpus-wide. The reference engine has no embedding surface at all
  * (hcymysql/mysql_to_clickhouse_sync sync.py is a row copier); this is
  * part of the mandated training-data-pipeline extension.
  *
  * Scale shape: centroids are c×dim doubles in a broadcast literal (the
  * corpus is never collected); assignment is one codegen'd kernel pass;
  * the only shuffle keys on `cluster`, and the pair stage is a
  * cluster-keyed equi-join — never a cross join. At 100 TB, c must grow
  * with the corpus (c ≈ n / targetClusterSize) so per-cluster pair cost
  * stays ~targetClusterSize² — [[semDedup]] enforces that with a loud
  * per-cluster cap check (the same refuse-don't-degrade stance as
  * [[VectorOps.guardQuadratic]]).
  *
  * Keep policy: a vector is dropped iff SOME smaller-id vector in its
  * cluster matches at >= tau ("pairwise-dominated", the same
  * deterministic, order-free rule as the MinHash/SimHash near-dup
  * surface). The paper's keep-farthest-from-centroid variant is one
  * ORDER BY swap on the same pair table.
  */
object SemDedup {

  /** Per-vector verdict: (idCol, cluster BIGINT, kept BIGINT 0/1).
    *
    * @param centroidsFlat row-major c×dim centroid matrix; defaults to
    *   the deterministic first-c-by-id sample ([[IvfOps.centroids]]);
    *   pass [[IvfOps.hashSampleCentroids]] (ingestion-order-free) or
    *   [[IvfOps.kmeansCentroids]] in production.
    * @param maxClusterRows loud-refusal bound on the largest cluster —
    *   past it the per-cluster pair stage is no longer "bounded
    *   quadratic" and the caller must raise c (or rebalance centroids).
    */
  def semDedup(vectors: DataFrame, c: Int, tau: Double,
               centroidsFlat: Option[Array[Double]] = None,
               idCol: String = "vec_id", embCol: String = "embedding",
               maxClusterRows: Long = 200000L): DataFrame = {
    val cents = centroidsFlat.getOrElse(IvfOps.centroids(vectors, c))
    val flat = lit(cents)
    val assigned = vectors.select(
      col(idCol), col(embCol),
      Kernels.ivfProbeCol(col(embCol), flat, c, 1).getItem(0).as("cluster"))

    // O(model)-sized eager check (c rows to the driver): the pair join
    // below costs Σ sizeᵢ² — refuse loudly when one cluster breaks the
    // bound rather than silently billing a corpus-scale quadratic.
    // max over ZERO groups is a null cell (empty input) — that's just
    // "no cluster too big", not an error
    val biggest = Option(assigned.groupBy("cluster").count()
      .agg(max(col("count"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (biggest > maxClusterRows) throw new IllegalStateException(
      s"semDedup cluster of $biggest rows exceeds maxClusterRows=" +
        s"$maxClusterRows: raise c (clusters must track corpus size) or " +
        "pass a larger bound deliberately")

    val a = assigned.select(col("cluster"), col(idCol).as("a_id"),
      col(embCol).as("a_e"))
    val b = assigned.select(col("cluster"), col(idCol).as("b_id"),
      col(embCol).as("b_e"))
    // cluster-keyed equi-join; rounded cosine so the verdict is
    // bit-stable cross-engine (same grid as the KNN/dup-pair surface)
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id") &&
        round(Kernels.cosineFFCol(col("a_e"), col("b_e")), 4) >= tau)
      .select(col("b_id").as(idCol)).distinct()
      .withColumn("is_dup", lit(1L))

    assigned
      .select(col(idCol), col("cluster").cast("long").as("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        when(col("is_dup").isNull, 1L).otherwise(0L).as("kept"))
  }
}
