package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev evidence tool for docs/SCALE.md: prefix-filtered jaccard join
  * (DedupOps.prefixJaccardPairs) vs the full inverted index
  * (DedupOps.jaccardPairs), on the plain corpus and on a
  * boilerplate-heavy variant (every document suffixed with the same
  * sentence — the hot-shingle regime the prefix order is built for:
  * boilerplate shingles have maximal document frequency, sort LAST in
  * the (df, shingle) order, and never enter the prefix index, while
  * the full index pays df² pairs on each of them).
  *
  * Usage: runMain graft.tools.PrefixStress <sfDir> [threshold] [--boilerplate]
  */
object PrefixStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val t = args.lift(1).filterNot(_.startsWith("--")).map(_.toDouble).getOrElse(0.7)
    val boiler = args.contains("--boilerplate")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("prefix-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.DedupOps
    val base = graft.model.Tables.documents(spark, sfDir)
    val docs =
      if (boiler) base.withColumn("text", concat(col("text"), lit(
        " subscribe to our newsletter terms and conditions apply all rights reserved")))
      else base
    val pairs = DedupOps.shingleArrays(docs, "text", "doc_id", 3)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    def cand(index: DataFrame): Long =
      index.select(col("doc_id").as("a_id"), col("shingle"))
        .join(index.select(col("doc_id").as("b_id"), col("shingle")), "shingle")
        .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct().count()
    val dfreq = pairs.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefIdx = pairs.join(dfreq, "shingle")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("toks"))
      .select(col("doc_id"), explode(expr(
        s"slice(toks, 1, greatest(1, cast(size(toks) - ceil(size(toks) * $t) + 1 as int)))"))
        .as("tok"))
      .select(col("doc_id"), col("tok.shingle").as("shingle"))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (prefCands, secPrefCands) = timed(cand(prefIdx))
    val (nPref, secPref) = timed(
      DedupOps.prefixJaccardPairs(docs, "text", "doc_id", 3, t).count())
    val (fullCands, secFullCands) = timed(cand(pairs))
    val (nFull, secFull) = timed(
      DedupOps.jaccardPairs(docs, "text", "doc_id", 3, t).count())
    println(f"[stress] sf=$sfDir t=$t boilerplate=$boiler " +
      f"fullCands=$fullCands (${secFullCands}%.1fs) " +
      f"prefCands=$prefCands (${secPrefCands}%.1fs) " +
      f"ratio=${prefCands.toDouble / fullCands}%.4f " +
      f"pairs=$nPref/$nFull secPrefix=$secPref%.2f secFullIndex=$secFull%.2f")
    spark.stop()
  }
}
