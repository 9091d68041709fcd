package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: head-to-head of the three exact-grouped-percentile forms
  * (buffered percentile() agg, two-pass histogram + join, one-pass
  * multi-column histogram) on the registered q_percentile workload.
  */
object PctPerf2 {
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
      noop(f) // prime codegen
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[pct2] $name%-18s min=${ts.min}%6.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("buffered") {
      li.groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.5D)").as("med_qty"),
        expr("percentile(l_quantity, 0.9D)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.25D)").as("p25_price"))
        .orderBy("l_returnflag")
    }
    time("hist-2pass-join") {
      graft.ops.HistQuantile.exactQuantiles(li, "l_returnflag",
        "l_quantity", Seq("med_qty" -> 0.5, "p90_qty" -> 0.9))
        .join(graft.ops.HistQuantile.exactQuantiles(li, "l_returnflag",
          "l_extendedprice", Seq("p25_price" -> 0.25)), Seq("l_returnflag"))
        .orderBy("l_returnflag")
    }
    time("hist-multi-1pass") {
      graft.ops.HistQuantile.exactQuantilesMulti(li, "l_returnflag",
        Seq("l_quantity" -> Seq("med_qty" -> 0.5, "p90_qty" -> 0.9),
          "l_extendedprice" -> Seq("p25_price" -> 0.25)))
        .orderBy("l_returnflag")
    }
    spark.stop()
  }
}
