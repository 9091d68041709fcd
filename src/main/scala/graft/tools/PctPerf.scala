package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: cost split of q_approx_percentile's three legs. */
object PctPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pct] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val li = graft.model.Tables.lineitem(spark, sfDir).select("l_extendedprice")
      time("scan+count")(li.agg(count(lit(1))).collect())
      time("sketch only")(li.agg(
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)")).collect())
      time("exact percentile only")(li.agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.95D))")).collect())
      time("histogram+window exact") {
        val h = li.groupBy(col("l_extendedprice").as("v"))
          .agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("v")).rowsBetween(Long.MinValue, 0)
        h.select(col("v"), sum(col("c")).over(w).as("cum")).agg(max("cum")).collect()
      }
      time("freq percentile") {
        val r = li.groupBy(col("l_extendedprice").as("v"))
          .agg(count(lit(1)).as("c"))
          .agg(expr("percentile(v, array(0.5D, 0.95D), c)").as("p"))
          .collect()(0).getSeq[Double](0)
        val direct = li.agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("p"))
          .collect()(0).getSeq[Double](0)
        println(s"[pct]   freq=$r direct=$direct equal=${r == direct}")
      }
      time("hist-window pick+interp") {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("v")).rowsBetween(Long.MinValue, 0)
        val wAll = org.apache.spark.sql.expressions.Window
          .orderBy(col("v")).rowsBetween(Long.MinValue, Long.MaxValue)
        val cum = li.groupBy(col("l_extendedprice").as("v"))
          .agg(count(lit(1)).as("c"))
          .select(col("v"), col("c"),
            sum("c").over(w).as("cum"), sum("c").over(wAll).as("n"))
        def pickAt(k: org.apache.spark.sql.Column) =
          max(when(col("cum") - col("c") <= k && k < col("cum"), col("v")))
        def pos(q: Double) = lit(q) * (col("n") - 1).cast("double")
        val r = cum.agg(
          max(col("n")).as("n"),
          pickAt(floor(pos(0.5))).as("l50"),
          pickAt(floor(pos(0.5)) + 1).as("h50"),
          pickAt(floor(pos(0.95))).as("l95"),
          pickAt(floor(pos(0.95)) + 1).as("h95")).collect()(0)
        val n = r.getLong(0)
        def interp(q: Double, lo: Double, hi: Double): (Double, Double) = {
          val p = q * (n - 1)
          val lower = math.floor(p)
          val a = lo + (p - lower) * (hi - lo)
          val b = (lower + 1 - p) * lo + (p - lower) * hi
          (a, b)
        }
        val (a50, b50) = interp(0.5, r.getDouble(1), r.getDouble(2))
        val (a95, b95) = interp(0.95, r.getDouble(3), r.getDouble(4))
        println(s"[pct]   A=(${a50},${a95}) B=(${b50},${b95})")
      }
      time("rank-count pass")(li.agg(
        sum(when(col("l_extendedprice") < 50000.0, 1L)).as("a"),
        sum(when(col("l_extendedprice") <= 50000.0, 1L)).as("b"),
        sum(when(col("l_extendedprice") < 90000.0, 1L)).as("c"),
        sum(when(col("l_extendedprice") <= 90000.0, 1L)).as("d")).collect())
    }
    spark.stop()
  }
}
