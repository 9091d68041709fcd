package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nearest-centroid (Rocchio / prototype) classification over an
  * embedding column — the classifier family that actually ships with
  * embedding pipelines (few-shot class prototypes, centroid-based
  * labeling), and the one whose distributed form is trivially a scan:
  * training is ONE aggregate (per-class counts + per-dimension sums —
  * 2·d+2 numbers, model-sized), classification is one more scan.
  *
  * Exactness: features ride [[Perceptron.quantize]]'s power-of-two
  * integer grid; the nearest-mean decision compares the two exact
  * RATIONAL squared distances with cross-multiplied integer
  * arithmetic (‖x−s₊/n₊‖² < ‖x−s₋/n₋‖², after dropping the shared
  * ‖x‖² term, ⇔ n₋²·(‖s₊‖² − 2n₊·x·s₊) < n₊²·(‖s₋‖² − 2n₋·x·s₋)) in
  * DECIMAL(38,0)/int128 — no division anywhere, so the result is
  * bit-identical under any partitioning and engine. Valid while
  * n²·‖s‖² < 10³⁸, i.e. class sizes to ~10⁷ at this grid/dimension —
  * beyond that the same model closes in doubles (it is 132 numbers).
  *
  * Contrast with [[Perceptron]]: the perceptron's fixed-round
  * full-batch form is deterministic but OSCILLATES on non-separable
  * classes (measured — docs/SCALE.md); the centroid rule has no
  * rounds to oscillate and degrades gracefully with class overlap.
  * Ties (equal distance) predict the negative class, pinned in the
  * oracle.
  */
object Rocchio {

  /** Per-class counts and per-dimension feature sums — the entire
    * trained model.
    */
  final case class Model(nPos: Long, nNeg: Long,
      sPos: Array[Long], sNeg: Array[Long])

  /** One-aggregate fit over a quantized frame (vec_id, y ±1,
    * x: array<long>) with `dims` features.
    */
  def fit(q: DataFrame, dims: Int): Model = {
    val aggs: Seq[Column] =
      Seq(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nn")) ++
      (0 until dims).flatMap(i => Seq(
        coalesce(sum(when(col("y") === 1L, element_at(col("x"), i + 1))),
          lit(0L)).as(s"p$i"),
        coalesce(sum(when(col("y") === -1L, element_at(col("x"), i + 1))),
          lit(0L)).as(s"n$i")))
    val r = q.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(r.getLong(0), r.getLong(1),
      Array.tabulate(dims)(i => r.getLong(2 + 2 * i)),
      Array.tabulate(dims)(i => r.getLong(3 + 2 * i)))
  }

  private val Dec = DecimalType(38, 0)

  /** x·s as an exact decimal higher-order aggregate. */
  private def dot(s: Array[Long]): Column =
    aggregate(
      zip_with(col("x"), typedlit(s.toSeq),
        (a, b) => a.cast(Dec) * b),
      lit(java.math.BigDecimal.ZERO).cast(Dec), (acc, v) => acc + v)

  /** Classify the quantized frame under the fitted model: output
    * (vec_id, y, y_pred).
    */
  def classify(q: DataFrame, m: Model): DataFrame = {
    def big(x: BigInt) = lit(new java.math.BigDecimal(x.bigInteger)).cast(Dec)
    val normP = m.sPos.map(v => BigInt(v) * v).sum
    val normN = m.sNeg.map(v => BigInt(v) * v).sum
    val nP = BigInt(m.nPos); val nN = BigInt(m.nNeg)
    // a = n₋²·(‖s₊‖² − 2n₊·x·s₊): constants fold driver-side
    val a = big(nN * nN * normP) - big(nN * nN * 2 * nP) * dot(m.sPos)
    val b = big(nP * nP * normN) - big(nP * nP * 2 * nN) * dot(m.sNeg)
    q.select(col("vec_id"), col("y"),
      when(a < b, 1L).otherwise(-1L).as("y_pred"))
  }
}
