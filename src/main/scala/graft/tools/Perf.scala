package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the BENCH hotspots. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Perf"
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, sfDir)
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    import graft.sim.DedupOps._
    time("shingleArrays")(shingleArrays(docs, "text", "doc_id", 3).count())
    time("shinglePairs")(shinglePairs(docs, "text", "doc_id", 3).count())
    time("sig")(minhashSignatures(docs, "text", "doc_id", 3, 32).count())
    time("candidates")(minhashCandidates(docs, "text", "doc_id", 3, 32, 8).count())
    time("jaccardPairs")(jaccardPairs(docs, "text", "doc_id", 3, 0.2).count())
    time("nearDupPairs")(nearDupPairs(docs, "text", "doc_id", 3, 32, 8, 0.2).count())
    time("simhash")(simhash64(docs, "text", "doc_id").count())
    spark.stop()
  }
}
