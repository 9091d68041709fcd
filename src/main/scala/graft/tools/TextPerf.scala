package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: where do the text-quality seconds go? Run each stage twice
  * (cold = incl. codegen compile, warm = steady state).
  */
object TextPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.model.Tables.documents(spark, sfDir)
    docs.count()
    def time(name: String)(f: => Unit): Unit = {
      for (round <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        f
        println(f"[tp] $name%-22s $round ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    time("full x_text_quality") {
      noop(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        bpeishTokenCount(col("text")).as("n_bpeish"),
        charsPerToken(col("text")).as("chars_per_token"),
        charClassRatio(col("text"), "[0-9]").as("digit_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy("doc_id"))
    }
    time("tokenCount only") {
      noop(docs.select(tokenCount(col("text")).as("n")))
    }
    time("bpeish only") {
      noop(docs.select(bpeishTokenCount(col("text")).as("n")))
    }
    time("charClassRatio only") {
      noop(docs.select(charClassRatio(col("text"), "[0-9]").as("r")))
    }
    time("stopwordRatio only") {
      noop(docs.select(stopwordRatio(col("text")).as("r")))
    }
    time("langId only") {
      noop(docs.select(langId(col("text")).as("l")))
    }
    spark.stop()
  }
}
