package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state grouped top-k: keep only the k best rows per group
  * inside the aggregation buffer (size-k sorted list, merged map-side).
  *
  * This is the scale-path alternative to `row_number().over(window)`
  * top-k: the window form sorts every group's FULL partition (a skewed
  * key sorts millions of rows to emit 3), while this buffer never holds
  * more than k rows per group and combines map-side before the shuffle.
  * Both forms are registered against the SAME DuckDB oracle
  * (`q_window_rank` / `q_grouped_topk_agg`) to prove semantic equality.
  */
object TopKAggregator {

  final case class Ranked(o_orderkey: Long, o_totalprice: Double)
  final case class TopKBuf(items: Seq[Ranked])

  /** Top-k by (o_totalprice DESC, o_orderkey ASC) of `extract(row)`. */
  def topOrders[IN](k: Int, extract: IN => Ranked): Aggregator[IN, TopKBuf, TopKBuf] =
    new Aggregator[IN, TopKBuf, TopKBuf] {
      private val ord: Ordering[Ranked] =
        Ordering.by((r: Ranked) => (-r.o_totalprice, r.o_orderkey))
      private def trim(xs: Seq[Ranked]): Seq[Ranked] = xs.sorted(ord).take(k)
      override def zero: TopKBuf = TopKBuf(Seq.empty)
      override def reduce(b: TopKBuf, in: IN): TopKBuf =
        TopKBuf(trim(b.items :+ extract(in)))
      override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(trim(a.items ++ b.items))
      override def finish(r: TopKBuf): TopKBuf = TopKBuf(r.items.sorted(ord))
      override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    }
}
