package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine linear-classifier training: the distributed batch
  * perceptron (Rosenblatt's rule, full-batch variant) over an
  * embedding column, integer-exact end to end.
  *
  * Why this shape for 100 TB model fitting: each round is ONE scan —
  * a single `agg` computes the per-dimension update sums over the
  * misclassified rows (map-side partials; d+1 numbers cross the
  * shuffle) — and the only driver state is the weight vector itself
  * (d+1 longs, model-sized like the IVF centroids and BPE merges).
  * No gradient tape, no float nondeterminism: features are quantized
  * to a POWER-OF-TWO grid (×1024 — a float times 1024.0 is exact in
  * double arithmetic, so `floor(v·1024 + 0.5)` has no
  * rounding-ambiguity at all, unlike the decimal cent grid), margins
  * and updates are long/int128 arithmetic, and the fixed-round result
  * is therefore bit-identical under any partitioning and in any
  * engine — the DuckDB oracle replays the identical rounds as
  * unrolled CTEs (the PageRank / BPE pattern).
  *
  * The update rule: a row with y·(w·x) ≤ 0 (ties count as errors, so
  * the all-zero w₀ updates on every row) contributes y·x to the next
  * round's weight delta. Fixed `rounds`, no early stopping — the
  * determinism contract over convergence heuristics.
  *
  * Validity bound (the [[Rocchio]] doc discipline): margins and the
  * per-round update sums accumulate in 64-bit longs, while the oracle
  * replays them in int128 — so the fixed-round identity holds exactly
  * while every intermediate stays under 2^63. Weights grow at most
  * |w| ≤ rounds·n·Grid per dimension and the dot accumulates
  * dims·Grid·|w|, so the binding constraint is
  * rounds·n·dims·Grid² < 2^63 — with rounds=3, dims=65, Grid=1024
  * that is n ≲ 4.5e10 rows. Past that, either train on a sample
  * (what any perceptron needs at that scale anyway) or switch the
  * accumulators to DECIMAL(38,0) like [[Rocchio]]'s dot; the harness
  * scales sit ~6 orders of magnitude inside the bound.
  *
  * Honest limit (measured, docs/SCALE.md): on LINEARLY SEPARABLE
  * classes the fixed-round result converges (spec-pinned); on
  * overlapping classes the full-batch simultaneous update
  * OSCILLATES between near-majority states — the harness embedding
  * labels are such a case. The deterministic classifier that learns
  * overlapping-class data is [[Rocchio]] (nearest centroid — no
  * rounds to oscillate); this file remains the round-based member of
  * the family and the machinery the oracle round-replay pins.
  */
object Perceptron {

  /** Power-of-two feature grid. */
  val Grid = 1024

  /** Quantize `embedding` to the integer grid, optionally append the
    * bias feature (constant `Grid` ≡ 1.0 — wanted by the perceptron's
    * affine decision, pointless for [[Rocchio]]'s distance decision),
    * and derive the ±1 target from `yPlus` (true → +1). Output:
    * (vec_id, y, x: array<long>).
    */
  def quantize(emb: DataFrame, yPlus: Column, bias: Boolean = true)
      : DataFrame = {
    val qx = transform(col("embedding"),
      v => floor(v.cast("double") * Grid + lit(0.5)).cast("long"))
    emb.select(col("vec_id"),
      when(yPlus, 1L).otherwise(-1L).as("y"),
      (if (bias) concat(qx, array(lit(Grid.toLong))) else qx).as("x"))
  }

  /** The dot product w·x as a codegen'd higher-order aggregate (no
    * UDF): zip_with product + aggregate sum over the array.
    */
  private def dot(w: Array[Long]): Column =
    aggregate(
      zip_with(col("x"), typedlit(w.toSeq), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)

  /** The signed margin y·(w·x). */
  private def margin(w: Array[Long]): Column = col("y") * dot(w)

  /** `rounds` full-batch perceptron rounds over the quantized frame;
    * returns the final weight vector (length `dims`). One scan + one
    * (d+1)-number aggregate per round — at 100 TB each round costs
    * one read; nothing row-scale ever reaches the driver.
    */
  def train(q: DataFrame, dims: Int, rounds: Int): Array[Long] = {
    var w = Array.fill(dims)(0L)
    for (_ <- 1 to rounds) {
      val sums = (0 until dims).map(i =>
        sum(col("y") * element_at(col("x"), i + 1)).as(s"s$i"))
      val row = q.filter(margin(w) <= 0L)
        .agg(sums.head, sums.tail: _*).collect()(0)
      w = Array.tabulate(dims)(i =>
        w(i) + (if (row.isNullAt(i)) 0L else row.getLong(i)))
    }
    w
  }

  /** AVERAGED full-batch perceptron (Freund & Schapire 1999, the
    * classical stabilizer): identical rounds to [[train]], but the
    * returned vector is the SUM Σᵣ wᵣ of the weight vector after each
    * round — still exact integer arithmetic, still one scan + one
    * (d+1)-number aggregate per round, and classifying with the sum is
    * classifying with the average (a positive 1/rounds scaling never
    * changes a sign). Where the plain full-batch update OSCILLATES on
    * overlapping classes (the honest limit above), the running sum
    * damps the oscillation: states the trajectory keeps revisiting
    * dominate the average.
    */
  def trainAveraged(q: DataFrame, dims: Int, rounds: Int): Array[Long] = {
    var w = Array.fill(dims)(0L)
    val acc = Array.fill(dims)(0L)
    for (_ <- 1 to rounds) {
      val sums = (0 until dims).map(i =>
        sum(col("y") * element_at(col("x"), i + 1)).as(s"s$i"))
      val row = q.filter(margin(w) <= 0L)
        .agg(sums.head, sums.tail: _*).collect()(0)
      w = Array.tabulate(dims)(i =>
        w(i) + (if (row.isNullAt(i)) 0L else row.getLong(i)))
      for (i <- 0 until dims) acc(i) += w(i)
    }
    acc
  }

  /** Classify the quantized frame under `w`: sign of the dot product,
    * zero predicted negative (mirror of the ≤-0-is-an-error training
    * tie rule). Output: (vec_id, y, y_pred).
    */
  def classify(q: DataFrame, w: Array[Long]): DataFrame =
    q.select(col("vec_id"), col("y"),
      when(dot(w) > 0L, 1L).otherwise(-1L).as("y_pred"))
}
