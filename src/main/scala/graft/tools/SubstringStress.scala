package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Worst-case scale stress for the substring-granularity dedup
  * (`x_substring_dedup`, the distributed Lee-et-al recipe): replicate
  * the corpus R× as EXACT copies under shifted doc_ids — every window
  * is then duplicated across all R replicas, so the removal fanout
  * (k × duplicate occurrences, the only term that grows with
  * duplication) is MAXIMAL. If the design is linear-in-corpus as
  * claimed (window election is one keyed shuffle; no pair join
  * anywhere), wall time should track corpus size ~R, not R².
  *
  * Usage: `sbt "runMain graft.tools.SubstringStress <sfDir> [k]"` —
  * prints one line per R with window/duplicate/removal counts and the
  * min-of-2 warm seconds.
  */
object SubstringStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("substring-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val n = base.count()
    def plan(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val b = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("w"))
      val wins = b.filter(size(col("w")) >= k)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("w")) - (k - 1))).as("s"),
          col("w"))
        .select(col("doc_id"), col("s").cast("long").as("s"),
          array_join(slice(col("w"), col("s"), lit(k)), " ").as("win"))
      val firsts = wins.groupBy("win")
        .agg(min(struct(col("doc_id"), col("s"))).as("f"),
          count(lit(1)).as("cnt"))
      val removed = wins.join(firsts, "win")
        .filter(col("cnt") > 1 &&
          !(col("doc_id") === col("f.doc_id") && col("s") === col("f.s")))
        .select(col("doc_id"),
          explode(sequence(col("s"), col("s") + (k - 1))).as("p"))
        .distinct()
      val toks = b.select(col("doc_id"), posexplode(col("w")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
          col("col").as("tok"))
      val kept = toks.join(removed, Seq("doc_id", "p"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
      (wins, removed, kept)
    }
    Seq(1, 5, 10).foreach { r =>
      val docs =
        if (r == 1) base
        else (0 until r).map(i => base.select(
            (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
            col("text"))).reduce(_ unionAll _)
      val (wins, removed, kept) = plan(docs)
      // counts once, outside the timing (each is its own job)
      val w = wins.count(); val rem = removed.count()
      val keptToks = kept.agg(sum(col("n_kept"))).head().getLong(0)
      // timed action = the whole pipeline to the final per-doc counts,
      // one job per run, min of 3 warm runs (the bench estimator)
      def timed(): Double = {
        val t0 = System.nanoTime()
        kept.agg(sum(col("n_kept"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = Seq(timed(), timed(), timed()).min
      println(f"""{"replicas":$r,"docs":${n * r},"windows":$w,"removed_positions":$rem,"kept_tokens":$keptToks,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
