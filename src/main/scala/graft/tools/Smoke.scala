package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke-runner: drives the driver-facing surface exactly as the
  * harness does — `SparkEntry.entry` on sf0.001 plus every registered
  * query — and prints row counts. Usage:
  *   sbt "runMain graft.tools.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val report = graft.SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${report.count()}")
    report.show(20, truncate = false)

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      println(s"[smoke] $name rows=$n")
    }
    spark.stop()
  }
}
