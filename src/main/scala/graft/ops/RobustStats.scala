package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Median-absolute-deviation outlier screening per group ([EXT] X4 —
  * the robust-statistics quality gate: mean/stddev break on the very
  * outliers being hunted, median/MAD don't; Hampel's 3-MAD rule).
  *
  * Medians are LOWER medians — the value at 1-based sorted index
  * `(n-1) div 2 + 1` — so every statistic is an actual data value (or
  * an IEEE |v−med| of two data values), never an interpolated float:
  * deterministic on any partitioning and replayed exactly by the
  * DuckDB twin (`x_anomaly_mad`). Ties between equal values are
  * immaterial — the indexed VALUE is the same whichever row wins.
  *
  * Scale shape: two sort-within-group windows (the price of exact
  * order statistics — each is a single shuffle on the group key, no
  * global sort) + a broadcast of the |groups|-row median table back
  * onto the stream. When values are known-low-cardinality, swap the
  * windows for [[HistQuantile]]'s value-count histogram form; when
  * approximate is acceptable at 100 TB, a per-group quantile sketch.
  * NULL values are excluded up front (engines disagree on NULL sort
  * order, and a NULL deviates from nothing).
  */
object RobustStats {

  /** Per-group `(group, n, med, mad, n_outliers)` where n_outliers
    * counts values with |v − med| > cut × mad.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  cut: Double = 3.0): DataFrame = {
    val spark = df.sparkSession
    val v = df.select(col(groupCol).as("g"), col(valCol).as("v"))
      .filter(col("v").isNotNull)

    def lowerMedian(in: DataFrame, c: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy(col(c))
      val n = Window.partitionBy("g")
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(n))
        .filter(col("rn") === expr("(n - 1) div 2 + 1"))
        .select(col("g"), col(c).as(s"${c}_med"), col("n"))
    }

    // Each median table is |groups| rows but sits on a corpus-sized
    // sort window — and the deviation lineage is consumed twice (once
    // to derive the MAD, once by the final aggregate). Materialize
    // both tiny tables so each window executes exactly ONCE — to the
    // DRIVER, not scratch parquet: the returned DataFrame reads its
    // inputs lazily, so a scratch-backed med/mad would pin its
    // directory for the JVM's lifetime (the leak the r9 advice
    // flagged), while a collected |groups|-row local relation needs no
    // cleanup at all. Driver-boundedness is the operator's existing
    // contract — the med table is one row per GROUP (a model-sized
    // dimension, like IVF centroids), never corpus-scale.
    def materialize(plan: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(plan.collect(): _*), plan.schema)
    val med = materialize(lowerMedian(v, "v"))
    val dev = v.join(broadcast(med), "g")
      .select(col("g"), col("v"), abs(col("v") - col("v_med")).as("d"),
        col("v_med"), col("n"))
    val mad = materialize(
      lowerMedian(dev.select(col("g"), col("d")), "d")
        .select(col("g"), col("d_med")))
    dev.join(broadcast(mad), "g")
      .groupBy("g")
      .agg(first(col("n")).as("n"), first(col("v_med")).as("med"),
        first(col("d_med")).as("mad"),
        sum(when(col("d") > lit(cut) * col("d_med"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g").as(groupCol), col("n"), col("med"), col("mad"),
        col("n_outliers"))
      .orderBy(groupCol)
  }
}
