package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `embedding: array<float>` columns
  * ([EXT] X2, SURVEY §2.11). All math is done in DOUBLE with sequential
  * left-to-right folds (`aggregate`) so results are reproducible and
  * oracle-able; everything is codegen'd builtin expressions — no UDFs.
  */
object VectorOps {

  import graft.functions.Kernels

  /** SF-guard for the documented O(n²) ORACLE-TWIN forms
    * ([[cosineDupPairs]], [[knnBruteForce]]; also
    * [[DedupOps.containmentPairs]] uncapped): they exist to
    * hash-check the bucketed/capped production forms at oracle scale,
    * and above `maxRows` they would quietly dominate any bench bill
    * (the pair space is quadratic). So past the threshold they REFUSE,
    * naming the production form to use — a loud refusal is the only
    * honest behavior: downsampling would silently measure a different
    * workload, and proceeding would bill n² at sf >= 1. The thresholds
    * pass every driver SF (<= sf0.1: 2k vectors / 5k docs) and trip at
    * the ~10x of sf1. Callers that KNOW better pass their own bound.
    */
  private[sim] def guardQuadratic(df: DataFrame, maxRows: Long,
                                  what: String, scalePath: String): DataFrame = {
    val n = df.count()
    if (n > maxRows) throw new IllegalStateException(
      s"$what is the O(n^2) oracle-twin form and refuses $n rows " +
        s"(> $maxRows): at this size use the production form " +
        s"($scalePath), or pass a larger maxOracleRows deliberately")
    df
  }

  /** All three operate on `array<float>` embeddings with double
    * accumulation, via codegen'd static kernels (Kernels.scala) — the
    * interpreted `zip_with`+`aggregate` fold was the BENCH hotspot.
    */
  def dot(a: Column, b: Column): Column = Kernels.dotFFCol(a, b)

  def l2Norm(a: Column): Column = Kernels.normFCol(a)

  def cosine(a: Column, b: Column): Column = Kernels.cosineFFCol(a, b)

  /** Brute-force top-k cosine neighbors: broadcast the (small) query set
    * against the candidate corpus — ONE pass over the big side, no
    * shuffle except the final per-query top-k (k·|queries| rows). This is
    * the exact baseline; [[lshBuckets]] is the approximate scale path.
    *
    * Ranking uses the ROUNDED similarity (4 dp) plus the neighbor id as
    * tiebreak, so the selected set is stable across engines/partitionings.
    */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int,
                    maxOracleRows: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = guardQuadratic(candidates, maxOracleRows,
      "knnBruteForce (x_knn_cosine)", "x_knn_ivf / x_knn_lsh")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim")
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold, a.vec_id < b.vec_id. EXACT all-pairs form for
    * oracle checking — the kernel cosine keeps the self-join compute
    * cheap, but the pair space is O(n²): the 100 TB path is the same
    * predicate over [[knnLsh]]/IVF candidates instead of the cross join.
    */
  def cosineDupPairs(vectors: DataFrame, threshold: Double,
                     maxOracleRows: Long = 10000L): DataFrame = {
    val guarded = guardQuadratic(vectors, maxOracleRows,
      "cosineDupPairs (x_dedup_embedding)",
      "cosineDupPairsLsh / x_dedup_embedding_lsh")
    // norms are precomputed once per input row, not per pair — the pair
    // stage pays only the dot product (same IEEE ops as cosine(), so the
    // oracle still matches bit-for-bit). The streamed side fans out
    // first: the nested-loop join's parallelism IS its left side's
    // partition count, and a one-file scan would run all n²/2 dot
    // products in one task (guide §2.5)
    val spread = graft.ops.CoreOps.fanOut(guarded)
    val a = spread.select(col("vec_id").as("a_id"),
      col("embedding").as("ae"), Kernels.normFCol(col("embedding")).as("an"))
    val b = guarded.select(col("vec_id").as("b_id"),
      col("embedding").as("be"), Kernels.normFCol(col("embedding")).as("bn"))
    // broadcast the UN-spread side so the planner streams the fanned-out
    // one (broadcasting `a` would put the single-partition side back on
    // the streaming end of the nested loop)
    a.crossJoin(broadcast(b)).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Kernels.dotFFCol(col("ae"), col("be")) /
          (col("an") * col("bn")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** The 100 TB shape of [[cosineDupPairs]]: sign-LSH bucket the vectors,
    * equi-join on `(table, bucket)` for candidates, then EXACT cosine
    * verify — identical output predicate, but the pair space is bucketed
    * instead of O(n²) and the physical plan is a shuffled equi-join, not
    * a cartesian product.
    *
    * One side of the self-join emits multi-probe keys (its bucket plus
    * every single-bit flip), so a pair becomes a candidate iff its two
    * bucket codes differ by ≤1 bit in ANY table — with the defaults the
    * per-pair miss probability at cos=0.4 is ~6e-6, and on the fixed
    * seeded planes recall vs the exact form is 1.0 (asserted in SimSpec).
    */
  def cosineDupPairsLsh(vectors: DataFrame, threshold: Double,
                        nTables: Int = 8, planesPerTable: Int = 4,
                        dim: Int = 64, probes: Int = 4,
                        directed: Boolean = false): DataFrame = {
    // candidate stage shuffles ONLY (id, key) pairs — embeddings rejoin
    // after the (a_id, b_id) dedup, so the wide array columns never ride
    // the candidate shuffle (at 100 TB that width is the cost driver)
    val probeKeys =
      if (directed) Kernels.lshKeysDirectedCol(col("embedding"), nTables,
        planesPerTable, dim, probes)
      else lshKeysMultiProbe(col("embedding"), nTables, planesPerTable,
        dim, probes)
    val a = vectors.select(col("vec_id").as("a_id"),
      explode(probeKeys).as("key"))
    val b = vectors.select(col("vec_id").as("b_id"),
      explode(lshKeys(col("embedding"), nTables, planesPerTable, dim)).as("key"))
    val cand = a.join(b, "key")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val va = vectors.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
      Kernels.normFCol(col("embedding")).as("an"))
    val vb = vectors.select(col("vec_id").as("b_id"), col("embedding").as("be"),
      Kernels.normFCol(col("embedding")).as("bn"))
    cand.join(va, "a_id").join(vb, "b_id")
      .select(col("a_id"), col("b_id"),
        round(Kernels.dotFFCol(col("ae"), col("be")) /
          (col("an") * col("bn")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** Deterministic random hyperplanes for sign-LSH (seeded, driver-built,
    * embedded as literals — tiny: nPlanes × dim doubles).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign(emb · plane_i). Cosine-similar
    * vectors collide with high probability; at 100 TB the bucket id is
    * the shuffle key, so each query only scans its bucket instead of the
    * full corpus.
    */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = Kernels.dotFDCol(emb, planeLit)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Multi-table sign-LSH bucket keys: `nTables` independent plane sets
    * (different seeds); a row emits one `(table, bucket)` struct per
    * table. Two vectors become candidates if they collide in ANY table —
    * the standard recall amplifier for sign-LSH.
    */
  def lshKeys(emb: Column, nTables: Int, planesPerTable: Int, dim: Int): Column =
    lshKeysMultiProbe(emb, nTables, planesPerTable, dim, probes = 0)

  /** Multi-probe variant: besides each table's own bucket, also emit the
    * buckets reachable by flipping each of the first `probes` sign bits —
    * vectors near a hyperplane land on either side, so probing the
    * adjacent buckets recovers them without adding tables. Applied to the
    * (small) query side only; candidate storage/shuffle is unchanged.
    *
    * One kernel call per row (Kernels.lshKeys): the literal-plane
    * expression form ([[lshBucket]], kept for tests/one-off bucketing)
    * exceeded the JVM method-size limit at production table counts and
    * disabled whole-stage codegen for the entire stage.
    */
  def lshKeysMultiProbe(emb: Column, nTables: Int, planesPerTable: Int,
                        dim: Int, probes: Int): Column = {
    require(probes <= planesPerTable)
    Kernels.lshKeysCol(emb, nTables, planesPerTable, dim, probes)
  }

  /** Per-vector symmetric int8 quantization stats ([EXT] X2 storage
    * path): scale = max|x|/127, codes = round(x/scale), and the
    * reconstruction error of dequantizing those codes. At 100 TB this is
    * the difference between shipping 4 bytes and 1 byte per dimension;
    * the stats quantify what that costs. Pure per-row map work — no
    * shuffle, no UDF — and every op is an IEEE double with a fixed fold
    * order, so a DuckDB twin reproduces it bit-for-bit.
    */
  def quantizeInt8Stats(vectors: DataFrame): DataFrame = {
    val xd = transform(col("embedding"), x => x.cast("double"))
    val maxAbs = aggregate(xd, lit(0.0), (a, x) => greatest(a, abs(x)))
    // zero vectors would make the scale 0 and the codes NaN; the floor is
    // far below any real float32 scale so it only bites the all-zero row
    val scale = greatest(maxAbs / lit(127.0), lit(1e-30))
    def dequantErr(x: Column, s: Column): Column =
      abs(x - round(x / s) * s)
    // the raw scale column must NOT share the output's name: lateral
    // column alias resolution would rebind the error expressions to the
    // 6-dp ROUNDED sibling alias and skew every stat by up to |q|·Δs
    vectors
      .withColumn("q_scale_raw", scale)
      .select(
        col("vec_id"),
        round(col("q_scale_raw"), 6).as("q_scale"),
        round(aggregate(xd, lit(0.0),
          (a, x) => greatest(a, dequantErr(x, col("q_scale_raw")))), 6)
          .as("max_err"),
        round(aggregate(xd, lit(0.0), (a, x) => {
          val d = x - round(x / col("q_scale_raw")) * col("q_scale_raw")
          a + d * d
        }) / size(col("embedding")), 9).as("mse"))
      .orderBy("vec_id")
  }

  /** Approximate top-k: bucket both sides with multi-table sign-LSH,
    * equi-join on `(table, bucket)`, dedup candidate pairs, rank. Recall
    * is tested against [[knnBruteForce]] in ScalaTest; it trades recall
    * for turning an O(|Q|·|C|) cross join into an equi-join whose shuffle
    * key is the bucket id.
    */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int,
             nTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64,
             multiProbe: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = lshKeys(col("embedding"), nTables, planesPerTable, dim)
    val qKeys = lshKeysMultiProbe(col("embedding"), nTables, planesPerTable,
      dim, multiProbe)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      explode(qKeys).as("key"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), explode(keys).as("key"))
    val scored = c.join(broadcast(q), "key")
      .select(col("query_id"), col("neighbor_id"), col("qe"), col("ce"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim")
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }
}
