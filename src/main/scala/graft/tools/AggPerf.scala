package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps.exactSum

/** Throwaway: is q1_agg's countDistinct leg worth a manual two-level
  * reshape (pre-aggregate on (group, partkey), then roll up)?
  */
object AggPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = graft.model.Tables.lineitem(spark, sfDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[agg] $name%-22s min=${ts.min}%6.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("registered") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base"),
          exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("cnt"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    time("no-distinct") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base"),
          exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    time("two-level") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(28,6)")).as("s_qty"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).as("s_base"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,6)")).as("s_disc"),
          count(lit(1)).as("c"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("s_qty")).cast("double").as("sum_qty"),
          sum(col("s_base")).cast("double").as("sum_base"),
          sum(col("s_disc")).cast("double").as("sum_disc_price"),
          sum(col("c")).as("cnt"),
          // count of non-null partkey groups — the exact aggregate the
          // registered q1_agg ships, so the measured shape matches it
          count(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    spark.stop()
  }
}
