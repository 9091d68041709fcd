package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps.exactSum

/** Throwaway: does pre-reducing orders by the customer dim before the
  * fact join pay on the Q3 shape?
  */
object Q3Perf {
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
    def ord = graft.model.Tables.orders(spark, sfDir)
    def cust = graft.model.Tables.customer(spark, sfDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[q3] $name%-22s min=${ts.min}%6.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("registered") {
      li.join(ord.filter(col("o_orderdate") < "2024-04-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }
    time("dim-first") {
      val ordRed = ord.filter(col("o_orderdate") < "2024-04-01")
        .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ordRed, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }
    spark.stop()
  }
}
