package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass binned quantile estimation — the scale path for percentiles.
  *
  * Exact `percentile` (q_percentile) buffers and sorts every group's
  * values; at 100 TB that is the operator you cannot afford on a hot
  * path. A fixed-grid histogram is one map-side-combinable aggregate
  * (the bin counts are algebraic state, mergeable across partitions,
  * increments, and days — the same state contract as
  * [[IncrementalAgg]]), and the quantile is then interpolated inside
  * the covering bin from `O(bins)` rows per group.
  *
  * Unlike t-digest/HLL-style sketches, the fixed grid is DETERMINISTIC:
  * bin edges don't depend on data order or partitioning, so the
  * estimate is bit-identical across engines — q_quantile_hist is
  * hash-matched by a DuckDB twin, not a rows-only check. Estimate
  * error is bounded by the bin width.
  */
object HistQuantile {

  /** Per-group quantile estimates of `value` on a fixed grid of
    * `binWidth`-wide bins anchored at 0. `qs` maps output column name →
    * quantile fraction. Output: group, n, one column per entry of `qs`.
    *
    * Every quantile comes out of ONE aggregation over the bin table: the
    * covering bin is the unique row with `cum − cnt < q·total ≤ cum`
    * (cum is strictly increasing over occupied bins), so each estimate
    * is `max(CASE WHEN covering THEN interpolation END)` — no per-
    * quantile self-join, and the raw data is binned exactly once.
    */
  def estimate(df: DataFrame, group: String, value: String,
               binWidth: Double, qs: Seq[(String, Double)]): DataFrame = {
    val bins = df
      // quantile semantics ignore NULLs (as percentile/quantile_cont do);
      // unfiltered they'd form a NULL bin that skews total and — since
      // Spark and DuckDB order NULL bins on opposite ends — desyncs the
      // cumulative walk between engines
      .filter(col(value).isNotNull)
      .groupBy(col(group), floor(col(value) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // both windows are over the ≤|bins| aggregated rows per group, never
    // the raw data
    val c = bins
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(group).orderBy("bin")))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(group)))

    def estimateCol(q: Double): Column = {
      val target = lit(q) * col("total")
      max(when(col("cum") >= target && (col("cum") - col("cnt")) < target,
        (col("bin") * lit(binWidth)) +
          ((target - (col("cum") - col("cnt"))) / col("cnt")) * lit(binWidth)))
    }

    c.groupBy(col(group))
      .agg(max(col("total")).as("n"),
        qs.map { case (name, q) => estimateCol(q).as(name) }: _*)
  }

  /** EXACT per-group `quantile_cont` via the same histogram shape: value
    * counts collapse duplicates map-side, the cumulative window runs
    * over DISTINCT values partitioned BY GROUP (no global single
    * partition), and `percentile()`'s interpolation — position q·(n−1),
    * floor/ceil rank neighbors weighted by distance, integral-position
    * special case — is reproduced in expressions, so the result is
    * bit-identical to `percentile()`/`quantile_cont` while the raw data
    * is aggregated exactly once instead of buffered whole through each
    * group's final merge. Output: group, one double column per `qs`.
    */
  def exactQuantiles(df: DataFrame, group: String, value: String,
                     qs: Seq[(String, Double)]): DataFrame =
    exactQuantilesMulti(df, group, Seq(value -> qs))

  /** Multi-column form of [[exactQuantiles]]: quantiles of SEVERAL value
    * columns in ONE pass over the data. Each row explodes into one
    * (column-tag, value) pair per requested column, the value-count
    * histogram is keyed by (group, tag, value), and the cumulative
    * window partitions by (group, tag) — so n columns cost one scan and
    * one shuffle instead of n scans + an n-way join, and the window
    * parallelism RISES with the column count. NULL handling is
    * per-column (a NULL in one column doesn't drop the row's other
    * values), matching per-column quantile_cont semantics.
    */
  def exactQuantilesMulti(df: DataFrame, group: String,
                          specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    val pairs = array(specs.map { case (v, _) =>
      struct(lit(v).as("vc"), col(v).cast("double").as("v")) }: _*)
    val c = df
      .select(col(group), explode(pairs).as("x"))
      .select(col(group), col("x.vc").as("vc"), col("x.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col(group), col("vc"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.partitionBy(col(group), col("vc"))
        .orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nn", sum(col("c")).over(Window.partitionBy(col(group), col("vc"))))
    // value at 0-indexed rank k is the unique row with cum − c ≤ k < cum
    // (within this column's histogram slice)
    def pickAt(vc: String, k: Column): Column =
      max(when(col("vc") === vc &&
        col("cum") - col("c") <= k && k < col("cum"), col("v")))
    def only(vc: String, e: Column): Column = max(when(col("vc") === vc, e))
    val flat = specs.flatMap { case (v, qs) => qs.map { case (n, q) => (v, n, q) } }
    val aggs = flat.flatMap { case (vc, name, q) =>
      val p = lit(q) * (col("nn") - 1).cast("double")
      Seq(pickAt(vc, floor(p)).as(s"__lo_$name"),
        pickAt(vc, ceil(p)).as(s"__hi_$name"),
        only(vc, floor(p)).as(s"__kf_$name"), only(vc, ceil(p)).as(s"__kc_$name"),
        only(vc, p).as(s"__p_$name"))
    }
    c.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
      .select(col(group) +: flat.map { case (_, name, _) =>
        when(col(s"__kf_$name") === col(s"__kc_$name"), col(s"__lo_$name"))
          .otherwise(
            (col(s"__kc_$name").cast("double") - col(s"__p_$name")) * col(s"__lo_$name") +
            (col(s"__p_$name") - col(s"__kf_$name").cast("double")) * col(s"__hi_$name"))
          .as(name)
      }: _*)
  }
}
