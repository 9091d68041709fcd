package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump physical plans for selected queries — the plan-review loop
  * (pushdown/pruning/broadcast checks). Usage:
  *   sbt "runMain graft.tools.Plans [query ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_range_scan_halfopen", "q1_agg", "q_join_broadcast",
        "q_join_multiway", "q_topk", "p1_projection")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
