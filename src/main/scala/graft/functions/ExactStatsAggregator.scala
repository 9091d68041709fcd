package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (SURVEY §2.10): an
  * `Aggregator[IN, BUF, OUT]` computing (count, exact decimal sum, min,
  * max) in one pass. The buffer is associative/commutative — decimal
  * addition is exact — so merge order (and therefore partitioning)
  * cannot change the result; the same engine-wide exactness rule as
  * [[graft.ops.CoreOps.exactSum]], here in typed form.
  */
object ExactStatsAggregator {

  final case class Stats(cnt: Long, sum: BigDecimal, min: Double, max: Double)

  /** Aggregate `extract(row)` over a typed group. */
  def of[IN](extract: IN => Double): Aggregator[IN, Stats, Stats] =
    new Aggregator[IN, Stats, Stats] {
      private val scale6 = java.math.MathContext.DECIMAL128
      override def zero: Stats =
        Stats(0L, BigDecimal(0, 6), Double.PositiveInfinity, Double.NegativeInfinity)
      override def reduce(b: Stats, in: IN): Stats = {
        val v = extract(in)
        Stats(b.cnt + 1,
          b.sum + BigDecimal(v, scale6).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          math.min(b.min, v), math.max(b.max, v))
      }
      override def merge(a: Stats, b: Stats): Stats =
        Stats(a.cnt + b.cnt, a.sum + b.sum,
          math.min(a.min, b.min), math.max(a.max, b.max))
      override def finish(r: Stats): Stats = r
      override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
