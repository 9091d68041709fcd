package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: times the slow BENCH_r02 outliers cold + warm to split
  * Janino/codegen compile cost from real plan cost.
  */
object SlowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_json_extract", "q_salted_join", "q_conditional_agg",
      "x_ngram_jaccard", "x_dedup_embedding_lsh", "x_dedup_clusters")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n%-24s r$round ${s}%.2fs")
      }
    }
    spark.stop()
  }
}
