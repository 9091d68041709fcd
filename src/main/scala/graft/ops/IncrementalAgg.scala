package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (algebraic) aggregate maintenance: keep per-key partial
  * states `(count, decimal sum)`, merge new data by re-aggregating the
  * UNION of partials — never by re-scanning history.
  *
  * This is the materialized-view pattern a 100 TB pipeline needs for
  * append-heavy tables: the nightly base is aggregated once, each new
  * increment is aggregated alone (O(delta)), and [[merge]] folds the two
  * partial states (O(|keys|)). The decimal sums are exact and
  * associative, so `merge(partial(A), partial(B)) == partial(A ∪ B)`
  * bit-for-bit — the equality the registry's `q_incremental_agg` proves
  * against a single-pass DuckDB oracle. (The reference re-copies whole
  * tables on every run, mysql_to_clickhouse_sync.py:92-108; this is the
  * Spark-native answer to the same freshness problem.)
  *
  * Average-style measures are DERIVED from (sum, count) at [[finish]]
  * time — storing them in the state would make it non-mergeable.
  */
object IncrementalAgg {

  /** Exact, associative accumulator type for double measures. */
  private val SumType = DecimalType(28, 6)

  /** Per-key partial state of `valueCol` over `df`: (part_cnt, part_sum). */
  def partial(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("part_cnt"),
      sum(col(valueCol).cast(SumType)).as("part_sum"))

  /** Fold partial states (any number, any grouping of the input rows
    * they came from) into one equivalent state.
    */
  def merge(key: String, parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(key)
      .agg(sum(col("part_cnt")).as("part_cnt"),
        sum(col("part_sum")).as("part_sum"))

  /** Resolve a state into user-facing columns (n, total, mean). */
  def finish(state: DataFrame, key: String): DataFrame =
    state.select(col(key),
      col("part_cnt").as("n"),
      col("part_sum").cast("double").as("total_value"),
      (col("part_sum").cast("double") / col("part_cnt")).as("avg_value"))
}
