package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage timing for the x_pagerank hotspot. */
object PrPerf {
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
      println(f"[prperf] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val li = graft.model.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")),
          "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val edgesArr = li
        .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, x -> transform(ps, y -> struct(x AS src, y AS dst))))")).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      val dir = graft.ops.CoreOps.scratchDir("prperf", sfDir)
      time("join shape: count")(edges.select(col("src").cast("long"), col("dst").cast("long")).distinct().count())
      time("array shape: count")(edgesArr.select(col("src").cast("long"), col("dst").cast("long")).distinct().count())
      time("edges write") {
        edgesArr.select(col("src").cast("long"), col("dst").cast("long"))
          .distinct()
          .write.mode("overwrite").parquet(s"$dir/edges")
      }
      val e = spark.read.parquet(s"$dir/edges")
      time("edge count")(println("  edges=" + e.count()))
      time("nodes write") {
        e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
          .distinct()
          .join(e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
            Seq("id"), "left")
          .write.mode("overwrite").parquet(s"$dir/nodes")
      }
      val nodes = spark.read.parquet(s"$dir/nodes")
      val n = time("node count")(nodes.count())
      println("  nodes=" + n)
      time("r0 write") {
        nodes.select(col("id"), col("deg"), lit(graft.ops.PageRank.Scale / n).as("rank"))
          .write.mode("overwrite").parquet(s"$dir/r0")
      }
      for (i <- 1 to 3) {
        time(s"iter $i") {
          val r = spark.read.parquet(s"$dir/r${i - 1}")
          val contrib = e
            .join(broadcast(r.filter(col("deg").isNotNull)
              .withColumnRenamed("id", "src")), "src")
            .select(col("dst"), expr("rank div deg").as("c"))
          val sums = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
          nodes
            .join(broadcast(sums.withColumnRenamed("dst", "id")), Seq("id"), "left")
            .select(col("id"), col("deg"),
              (lit(graft.ops.PageRank.Scale * 150L / 1000L / n) +
                expr("(850 * coalesce(s, 0L)) div 1000")).as("rank"))
            .write.mode("overwrite").parquet(s"$dir/r$i")
        }
      }
      time("final topk") {
        spark.read.parquet(s"$dir/r3").select("id", "rank")
          .orderBy(col("rank").desc, col("id")).limit(20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
