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

  /** PRODUCTION centroid seed: the `c` vectors with the smallest
    * md5-derived hash of their id — a uniform pseudo-random sample of
    * the corpus that is still fully deterministic and
    * partitioning-independent (same ids win on any cluster layout,
    * plans as top-c per-partition heaps, never a shuffle of the
    * corpus). The first-`c`-by-id seed above stays for the
    * oracle-replayable registered queries, but at real scale ids
    * correlate with ingestion order (one day, one source), and seeding
    * all centroids from one corner of the corpus starves k-means;
    * hashing breaks that correlation with no randomness to reproduce.
    * Swap in via `knnIvf(..., centroidsFlat = Some(hashSampleCentroids(...)))`
    * or as the [[kmeansCentroids]] start.
    */
  def hashSampleCentroids(candidates: DataFrame, c: Int): Array[Double] =
    candidates
      .withColumn("h", Kernels.md5_48Col(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(c)
      .select("embedding").collect()
      .flatMap(_.getSeq[Float](0).map(_.toDouble))

  /** Lloyd-refined centroids: start from the deterministic sample, then
    * `iters` rounds of assign (kernel nearest-centroid, distributed) →
    * recenter (per-cluster per-dimension mean; only c×dim scalars ever
    * reach the driver). Clusters that lose all members keep their
    * previous centroid.
    */
  def kmeansCentroids(candidates: DataFrame, c: Int, iters: Int = 5,
                      init: Option[Array[Double]] = None): Array[Double] = {
    var cents = init.getOrElse(centroids(candidates, c))
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

  /** Deterministic per-subvector PQ codebooks: centroid j of subvector
    * s is the s-th subvector of the j-th corpus vector by id (the same
    * bounded deterministic-sample stance as [[centroids]]), flattened
    * to the [[Kernels.pqAssign]] layout. ksub×dim doubles — tiny,
    * travels as a broadcast literal; the corpus is never collected.
    */
  def pqCodebooks(candidates: DataFrame, m: Int, ksub: Int): Array[Double] = {
    val sample = candidates.orderBy("vec_id").limit(ksub)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= ksub,
      s"pqCodebooks needs >= $ksub candidate vectors, found ${sample.length}")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    val dsub = dim / m
    val out = new Array[Double](m * ksub * dsub)
    for (s <- 0 until m; j <- 0 until ksub; t <- 0 until dsub)
      out(((s * ksub) + j) * dsub + t) = sample(j)(s * dsub + t)
    out
  }

  /** Lloyd-refined PQ codebooks: start from the deterministic sample,
    * then `iters` rounds of assign (kernel, distributed) → recenter
    * (per-(subvector, code, dim) mean — only m×ksub×dsub scalars ever
    * reach the driver, same bounded-driver-data stance as
    * [[kmeansCentroids]]). Codes that lose all members keep their
    * previous centroid. Refined codebooks tighten ADC's quantization
    * error, which directly raises recall at a fixed rerank depth.
    */
  def pqKmeansCodebooks(candidates: DataFrame, m: Int, ksub: Int,
                        iters: Int = 5): Array[Double] = {
    var books = pqCodebooks(candidates, m, ksub)
    val dim = {
      val d = candidates.select("embedding").head().getSeq[Float](0).length
      require(d % m == 0, s"dim $d must divide into $m subvectors"); d
    }
    val dsub = dim / m
    for (_ <- 0 until iters) {
      val flat = lit(books)
      // (vector, s) → assigned code; (vector, d) → element; s = d/dsub
      val means = candidates
        .select(Kernels.pqAssignCol(col("embedding"), flat, m, ksub)
          .as("codes"), col("embedding"))
        .select(col("codes"), posexplode(col("embedding")).as(Seq("d", "v")))
        .select((col("d") / dsub).cast("int").as("s"),
          (col("d") % dsub).cast("int").as("t"),
          element_at(col("codes"), (col("d") / dsub).cast("int") + 1)
            .as("code"),
          col("v").cast("double").as("v"))
        .groupBy("s", "code", "t").agg(avg(col("v")).as("mean"))
        .collect()
      val next = books.clone()
      means.foreach { r =>
        next(((r.getInt(0) * ksub) + r.getInt(1)) * dsub + r.getInt(2)) =
          r.getDouble(3)
      }
      books = next
    }
    books
  }

  /** IVF-PQ: the 100 TB memory shape for ANN. The index carries ONE int
    * (cluster) + m small codes per vector — never the embedding — so
    * the scan side is ~m bytes/vector instead of dim floats; scoring a
    * candidate is m table lookups against the query's precomputed ADC
    * table (squared L2). The probe join is the same cluster-keyed
    * equi-join as [[knnIvf]]; ADC survivors (rerank per query, a
    * per-query window over probed candidates only) rejoin their
    * embeddings for an EXACT cosine re-rank with the deterministic
    * brute-force tie-break — so with exhaustive probing and a
    * sufficient rerank depth the output is bit-identical to brute
    * force while the pipeline exercises the real compressed-index
    * dataflow.
    */
  def knnIvfPq(queries: DataFrame, candidates: DataFrame, k: Int,
               c: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
               rerank: Int = 50,
               centroidsFlat: Option[Array[Double]] = None,
               codebooksFlat: Option[Array[Double]] = None): DataFrame = {
    val cents = lit(centroidsFlat.getOrElse(centroids(candidates, c)))
    val books = lit(codebooksFlat.getOrElse(pqCodebooks(candidates, m, ksub)))
    val index = candidates.select(col("vec_id").as("neighbor_id"),
      Kernels.ivfProbeCol(col("embedding"), cents, c, 1).getItem(0)
        .as("cluster"),
      Kernels.pqAssignCol(col("embedding"), books, m, ksub).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      Kernels.pqTableCol(col("embedding"), books, m, ksub).as("qt"),
      explode(Kernels.ivfProbeCol(col("embedding"), cents, c, nprobe))
        .as("cluster"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val survivors = index.join(broadcast(q), "cluster")
      .select(col("query_id"), col("neighbor_id"),
        Kernels.pqAdcCol(col("codes"), col("qt"), ksub).as("adc"))
      .withColumn("rn", row_number().over(wAdc)).filter(col("rn") <= rerank)
      .select("query_id", "neighbor_id")
    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val ce = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val scored = survivors.join(broadcast(qe), "query_id").join(ce, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(Kernels.cosineFFCol(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim")
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
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
