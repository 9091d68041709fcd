package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-arithmetic Lloyd k-means over an embedding column ([EXT] X2 —
  * the clustering primitive under SemDeDup-style semantic dedup, IVF
  * coarse quantizers, and domain-mixture analysis; reference has no
  * analytics of its own, see SURVEY §2.11).
  *
  * [[graft.sim.IvfOps.kmeansCentroids]] is the double-precision
  * production refiner; THIS form exists to make the full Lloyd loop
  * itself oracle-checkable: every quantity is integer arithmetic, so
  * the result is bit-identical on any partitioning, any engine, any
  * reduction order — the property the DuckDB twin (`x_kmeans`) pins.
  *
  * Arithmetic contract:
  *   - inputs quantize to fixed-point at [[Scale]] = 2^20 via
  *     `floor(v * Scale + 0.5)` (half-up, no banker's-rounding
  *     ambiguity between engines);
  *   - distances are exact integer squared-L2 over quantized dims:
  *     |v| ≤ 1 ⇒ per-dim square ≤ 2^42, × dim 64 ≪ 2^63;
  *   - centroid update is `sum(vq) div n` — truncating integer
  *     division, which Spark's `div`, Java's `/`, and DuckDB's `//`
  *     all agree on (including negatives, toward zero);
  *   - argmin ties break to the lowest cluster id;
  *   - clusters that lose every member keep their previous centroid.
  *
  * Scale shape: per iteration, ONE map-only assignment pass (k×dim
  * centroid literals travel in the plan, k distances per row folded
  * with `aggregate`/`zip_with` inside codegen) and ONE k×dim-key
  * hash aggregate (map-side combined; only k×dim longs reach the
  * driver — the corpus is never collected). Long-sum headroom: at
  * 2^20 scale a cluster can absorb ~2^42 members per dimension before
  * `sum(vq)` nears 2^63 — comfortably past 100 TB row counts.
  */
object KMeansExact {

  /** Fixed-point scale, 2^20 — six+ decimal digits of the unit-range
    * embedding values, with ~2^21 integer headroom per dim square.
    */
  val Scale = 1048576L

  /** Quantized copy of `embCol`: array<bigint> at [[Scale]]. */
  def quantizeCol(embCol: Column): Column =
    transform(embCol,
      x => floor(x.cast("double") * lit(Scale.toDouble) + lit(0.5d))
        .cast("long"))

  /** Exact squared-L2 between a quantized vector column and a literal
    * quantized centroid (ordered fold — but integer addition is
    * associative-exact, so the order is immaterial to the value).
    */
  private def d2To(qv: Column, cent: Array[Long]): Column =
    aggregate(
      zip_with(qv, lit(cent), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Assignment pass: `(idCol, qv, cluster, d2)` for the given flat
    * centroids (row-major k×dim). Ties take the lowest cluster id via
    * `array_position`'s first-match contract.
    */
  def assign(quantized: DataFrame, cents: Array[Long], k: Int,
             idCol: String = "vec_id"): DataFrame = {
    val dim = cents.length / k
    val dists = array((0 until k).map { j =>
      d2To(col("qv"), java.util.Arrays.copyOfRange(cents, j * dim, (j + 1) * dim))
    }: _*)
    quantized
      .withColumn("__d", dists)
      .withColumn("d2", array_min(col("__d")))
      .withColumn("cluster",
        (array_position(col("__d"), col("d2")) - 1L).cast("int"))
      .drop("__d")
  }

  /** `(idCol, qv)` — the quantized working set every stage reads. */
  def quantized(vectors: DataFrame, idCol: String = "vec_id",
                embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), quantizeCol(col(embCol)).as("qv"))

  /** Seed centroids: the k smallest ids, cluster j = rank j
    * (deterministic and oracle-replayable; for production seeding at
    * scale prefer IvfOps.hashSampleCentroids' ingestion-order-free
    * sample — the loop is seed-agnostic).
    */
  def seedCentroids(quantized: DataFrame, k: Int,
                    idCol: String = "vec_id"): Array[Long] =
    quantized.orderBy(idCol).limit(k)
      .select("qv").collect()
      .flatMap(_.getSeq[Long](0))

  /** Run `iters` Lloyd rounds from the first-k-by-id seed and return
    * the final assignment `(idCol, cluster, d2)` under the
    * post-iteration centroids, ordered by id.
    */
  def fit(vectors: DataFrame, k: Int, iters: Int,
          idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val quantized = this.quantized(vectors, idCol, embCol)
    val first = vectors.select(embCol).take(1)
    if (first.isEmpty) // no corpus → no centroids → empty assignment
      return quantized.select(col(idCol), lit(0).cast("int").as("cluster"),
        lit(0L).as("d2")).limit(0)
    val dim = first(0).getSeq[Float](0).length

    var cents: Array[Long] = seedCentroids(quantized, k, idCol)
    require(cents.length == k * dim,
      s"kmeans seed needs $k vectors, found ${cents.length / math.max(dim, 1)}")

    for (_ <- 0 until iters) {
      val sums = assign(quantized, cents, k, idCol)
        .select(col("cluster"), posexplode(col("qv")).as(Seq("d", "v")))
        .groupBy("cluster", "d")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.clone() // empty clusters keep their centroid
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        next(c * dim + d) = r.getLong(2) / r.getLong(3) // toward-zero div
      }
      cents = next
    }
    assign(quantized, cents, k, idCol)
      .select(col(idCol), col("cluster"), col("d2"))
      .orderBy(idCol)
  }
}
