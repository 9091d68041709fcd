package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for the training-data pipeline ([EXT] X1,
  * SURVEY §2.11): exact, n-gram Jaccard (exact set similarity via an
  * inverted index), MinHash+LSH (approximate scale path), SimHash.
  * Builtin expressions only — codegen'd end to end.
  */
object DedupOps {

  /** Exact dedup with a deterministic winner: keep the minimum id per
    * text. Plain hash-aggregate — one shuffle on the dedup key.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /** Distinct `(id, shingle)` pairs: 3-word shingles over lowercased,
    * whitespace-split text. Docs shorter than `n` tokens emit nothing
    * (mirrors the DuckDB oracle's `range(len(w)-n+1)` semantics).
    */
  def shinglePairs(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val t = TextFunctions.tokens(lower(col(textCol)))
    df.select(col(idCol), t.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))).as("shingle"))
      .distinct()
  }

  /** EXACT n-gram Jaccard similarity for all pairs above `threshold`,
    * computed with an inverted-index self-join (pairs are only generated
    * for docs sharing ≥1 shingle — never a cross join):
    *
    *   (id, shingle) ⨝_shingle (id, shingle) → count = |A ∩ B|
    *   jaccard = |A∩B| / (|A| + |B| - |A∩B|)
    *
    * At 100 TB the known hazard is hot shingles (document-frequency skew)
    * blowing up the pair count — production path is [[minhashCandidates]]
    * + this as the verify stage on candidates only. `maxShingleDf` caps
    * the inverted-index fanout when exactness is not required (the
    * oracled query leaves it off).
    */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    val s = shinglePairs(df, textCol, idCol, n)
    val sPruned = maxShingleDf match {
      case Some(cap) =>
        val hot = s.groupBy("shingle").count().filter(col("count") > cap)
          .select("shingle")
        s.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => s
    }
    val sizes = s.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sPruned.select(col(idCol).as("a_id"), col("shingle"))
    val b = sPruned.select(col(idCol).as("b_id"), col("shingle"))
    val inter = a.join(b, "shingle")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("sz").as("b_sz")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** MinHash signature columns: h_i = min over shingles of
    * xxhash64(seed_i, shingle). One hash-aggregate produces all k
    * components (k narrow agg columns, map-side combined).
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, k: Int = 32): DataFrame = {
    val s = shinglePairs(df, textCol, idCol, n)
    val aggs = (0 until k).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    s.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over the signature: `bands` bands of `k/bands` rows
    * each; docs sharing any band-hash become candidate pairs. The
    * band-hash equi-join replaces the all-pairs comparison — this is the
    * 100 TB path (shuffle keyed on (band, bandHash), skew-safe because
    * identical-band collisions are exactly the near-dup candidates).
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
    val sig = minhashSignatures(df, textCol, idCol, n, k)
    val bandCols = (0 until bands).map { bnd =>
      val parts = (0 until rows).map(r => col(s"h${bnd * rows + r}"))
      struct(lit(bnd).as("band"), xxhash64(parts: _*).as("bh"))
    }
    val banded = sig.select(col(idCol), explode(array(bandCols: _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.as("x").join(banded.as("y"), Seq("band", "bh"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct()
  }

  /** Near-dup pairs: MinHash-LSH candidates verified with EXACT Jaccard
    * (candidates-only inverted index — the production two-stage shape).
    */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, k: Int = 32, bands: Int = 8,
                   threshold: Double = 0.5): DataFrame = {
    val cand = minhashCandidates(df, textCol, idCol, n, k, bands)
    val s = shinglePairs(df, textCol, idCol, n)
    val sizes = s.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(s.select(col(idCol).as("a_id"), col("shingle")), "a_id")
      .join(s.select(col(idCol).as("b_id"), col("shingle")), Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("sz").as("b_sz")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum +1/−1 weighted
    * by token-hash bit i; fingerprint bit i = (sum_i > 0). Expressed as
    * one explode + one 64-column hash-aggregate (map-side combined).
    */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"s$i"))
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    sums.select(col(idCol), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
