package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE tokenizer TRAINING ([EXT] X4) — the step that turns a
  * corpus into the merge table a real tokenizer ships. Classic weighted
  * form: train on the WORD HISTOGRAM, not the corpus — after one
  * corpus-scale aggregation, every merge round works on |vocab| rows
  * (the property that makes BPE training tractable at 100 TB: rounds
  * cost vocab-size, corpus size only enters once).
  *
  * Each round: count adjacent symbol pairs weighted by word frequency,
  * pick the most frequent (ties → lexicographic (left, right) — fully
  * deterministic), merge it everywhere. The merge applies a DOUBLE
  * non-overlapping left-to-right `replace` of the space-delimited pair
  * (two passes because one consumes the shared delimiter between
  * adjacent occurrences — 'a b a b' needs the second pass). That exact
  * replace semantics is reproduced by the DuckDB twin, so the learned
  * merges are hash-matched cross-engine; it deviates from textbook BPE
  * only on 3+ repetitions of the same symbol ('a a a a'), identically
  * on both engines.
  *
  * The merge choice flows back into the next round as a broadcast
  * 1-row join (never a collected driver value), and the word histogram
  * is materialized once to scratch parquet so the per-round aggregate
  * forest re-reads |vocab| rows instead of re-scanning the corpus.
  */
object BpeTrain {

  /** Learned merges: (round, lft, rgt, merged, n) — one row per round,
    * in merge order.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    // ONE corpus-scale pass: the weighted word histogram, materialized
    // so the unrolled round plans below never re-scan the corpus. The
    // dir is unique PER INVOCATION (scratchDirUnique): the returned
    // merge table is a lazy plan over this histogram, and a shared
    // dir keyed on the column name would let train() on corpus B
    // overwrite the histogram underneath corpus A's unconsumed result.
    // The leak is |vocab| rows per call, reclaimed with the JVM tmpdir
    // — not the corpus-scale copy scratchDir's reuse guards against.
    val dir = CoreOps.scratchDirUnique("bpe_hist")
    docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(dir)
    val words = spark.read.parquet(dir)

    // symbol sequences as space-delimited, space-padded strings:
    // "spark" -> " s p a r k "
    var seqs = words.select(
      concat(lit(" "),
        array_join(expr(
          "transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))"),
          " "),
        lit(" ")).as("s"),
      col("cnt"))

    var merges: Seq[DataFrame] = Seq.empty
    for (r <- 1 to rounds) {
      val pairs = seqs
        .select(col("cnt"), split(trim(col("s")), " ").as("a"))
        .select(col("cnt"), explode(arrays_zip(
          slice(col("a"), lit(1), size(col("a")) - 1).as("l"),
          slice(col("a"), lit(2), size(col("a")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("lft"), col("p.r").as("rgt"))
        .agg(sum(col("cnt")).as("n"))
      val best = pairs
        .orderBy(col("n").desc, col("lft"), col("rgt")).limit(1)
      merges = merges :+ best.select(lit(r.toLong).as("round"),
        col("lft"), col("rgt"), concat(col("lft"), col("rgt")).as("merged"),
        col("n"))
      val b = broadcast(
        best.select(col("lft").as("__l"), col("rgt").as("__r")))
      seqs = seqs.crossJoin(b).select(
        expr("""replace(
          replace(s, concat(' ', __l, ' ', __r, ' '), concat(' ', __l, __r, ' ')),
          concat(' ', __l, ' ', __r, ' '), concat(' ', __l, __r, ' '))""")
          .as("s"),
        col("cnt"))
    }
    merges.reduce(_ unionAll _).orderBy("round")
  }

  /** Apply a learned merge table to the corpus — the ENCODE half: each
    * word re-tokenizes by replaying the merges in round order (same
    * double-pass replace as training), giving per-document BPE token
    * counts next to the whitespace word count. Encoding is a pure
    * function of the word, so the string work runs over DISTINCT words
    * only — vocab-sized, not corpus-sized — and the corpus rejoins the
    * encoded lengths by word (broadcast at any realistic vocab).
    *
    * The merge table is COLLECTED once: it is rounds-sized (the same
    * bounded-driver-data exception as IVF centroids), collecting
    * evaluates the lazy training plan exactly once instead of once per
    * round, and rounds the corpus never earned (a merge table shorter
    * than `rounds`) are skipped instead of annihilating the word table
    * through an empty cross join.
    */
  def encodeStats(docs: DataFrame, textCol: String, merges: DataFrame,
                  rounds: Int): DataFrame = {
    val learned = merges.orderBy("round")
      .select("lft", "rgt").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .take(rounds)
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
    var seqs = words.select("w").distinct()
      .select(col("w"),
        concat(lit(" "),
          array_join(expr(
            "transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))"),
            " "),
          lit(" ")).as("s"))
    for ((l, r) <- learned) {
      val pat = concat(lit(" "), lit(l), lit(" "), lit(r), lit(" "))
      val rep = concat(lit(" "), lit(l), lit(r), lit(" "))
      seqs = seqs.select(col("w"),
        replace(replace(col("s"), pat, rep), pat, rep).as("s"))
    }
    val encoded = seqs.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("n_sym"))
    words.join(broadcast(encoded), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }
}
