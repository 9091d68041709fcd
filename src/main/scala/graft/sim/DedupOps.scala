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

  /** Per-doc DISTINCT shingle arrays: 3-word shingles over lowercased,
    * whitespace-split text. Docs shorter than `n` tokens emit nothing
    * (mirrors the DuckDB oracle's `range(len(w)-n+1)` semantics).
    *
    * Deduplication happens locally per row (`array_distinct`), NOT with a
    * row-level `distinct()` — at 100 TB that saves a full shuffle of the
    * exploded shingle stream, and set sizes come free from `size(sh)`.
    */
  def shingleArrays(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        graft.functions.Kernels.shinglesCol(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Distinct `(id, shingle)` pairs — the exploded inverted-index form. */
  def shinglePairs(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    shingleArrays(df, textCol, idCol, n)
      .select(col(idCol), explode(col("sh")).as("shingle"))

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
  /** Shingle-partitioned inverted index `(id, shingle)`, optionally
    * pruned of shingles shared by more than `maxShingleDf` docs (a
    * boilerplate shingle in k docs contributes k² candidate rows; under
    * the cap, scores are computed over the PRUNED shingle universe —
    * both |A∩B| and the set sizes, see [[setSizes]] — so they are exact
    * similarities of the docs' non-boilerplate shingle sets, and the
    * cap is a deterministic function of the corpus that an oracle can
    * replay). Hash-partitioned ONCE on the join key: the a/b sides
    * of a self-join are identical subplans, so ReuseExchange shuffles
    * this stream a single time (and blocks AQE from trying to broadcast
    * a million-row exploded side). Shared by [[jaccardPairs]] and
    * [[containmentPairs]] so the cap and partitioning can't diverge.
    */
  private def invertedIndex(sh: DataFrame, idCol: String,
                            maxShingleDf: Option[Int]): DataFrame = {
    val s = sh.select(col(idCol), explode(col("sh")).as("shingle"))
      .repartition(col("shingle"))
    maxShingleDf match {
      case Some(cap) =>
        val hot = s.groupBy("shingle").count().filter(col("count") > cap)
          .select("shingle")
        s.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => s
    }
  }

  /** Per-doc set sizes over the SAME shingle universe the intersection
    * is counted in. Uncapped, that's a local projection off the arrays
    * (free); capped, sizes must be re-counted from the pruned index —
    * dividing a pruned-universe numerator by a full-universe |sh(a)|
    * would systematically underestimate every surviving pair's score
    * and silently drop pairs whose overlap is partly boilerplate.
    */
  private def setSizes(sh: DataFrame, pruned: DataFrame, idCol: String,
                       maxShingleDf: Option[Int]): DataFrame =
    maxShingleDf match {
      case Some(_) =>
        pruned.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
      case None =>
        sh.select(col(idCol), size(col("sh")).cast("long").as("sz"))
    }

  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = shingleArrays(df, textCol, idCol, n)
    val sPruned = invertedIndex(sh, idCol, maxShingleDf)
    val sizes = setSizes(sh, sPruned, idCol, maxShingleDf)
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

  /** Directed shingle-containment pairs: containment(a→b) =
    * |sh(a) ∩ sh(b)| / |sh(a)| ≥ threshold, a ≠ b — the asymmetric
    * near-dup detector (quotations, partial copies, article-in-digest)
    * that Jaccard misses when the containing document is much longer
    * than the contained one. Same inverted-index shape as
    * [[jaccardPairs]]: candidates are shared-shingle pairs only, never
    * all-pairs, and the index shuffles once on the shingle key.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       maxShingleDf: Option[Int] = None,
                       maxOracleRows: Long = 20000L): DataFrame = {
    // the UNCAPPED form is the oracle twin: without the hot-shingle DF
    // cap, one corpus-wide boilerplate shingle in k docs contributes k²
    // candidate rows on a single join key — guard it like the other
    // exact twins (the capped form is the production path at any size)
    val guarded =
      if (maxShingleDf.isDefined) df
      else VectorOps.guardQuadratic(df, maxOracleRows,
        "containmentPairs without a DF cap (x_containment)",
        "maxShingleDf / x_containment_capped")
    val sh = shingleArrays(guarded, textCol, idCol, n)
    val s = invertedIndex(sh, idCol, maxShingleDf)
    val sizes = setSizes(sh, s, idCol, maxShingleDf)
    val a = s.select(col(idCol).as("a_id"), col("shingle"))
    val b = s.select(col(idCol).as("b_id"), col("shingle"))
    a.join(b, "shingle")
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("a_sz")), "a_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / col("a_sz")).as("containment"))
      .filter(col("containment") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** EXACT Jaccard pairs via POSITIONAL PREFIX FILTERING (the SSJoin/
    * PPJoin family — Chaudhuri et al., "A Primitive Operator for
    * Similarity Joins", ICDE'06; Xiao et al., "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW'08; Vernica et al.'s
    * MapReduce formulation, SIGMOD'10): identical OUTPUT to
    * [[jaccardPairs]], but the inverted index holds only each
    * document's PREFIX — its `|x| - ceil(t·|x|) + 1` globally-rarest
    * shingles under a corpus-wide (document-frequency, shingle) order.
    *
    * Why it's the 100 TB shape: two docs with J ≥ t MUST share a
    * prefix token (pigeonhole: disjoint prefixes leave fewer than
    * `t·|x|` tokens to overlap), so candidate volume is driven by RARE
    * shingle document frequencies instead of the full DF distribution —
    * the hot boilerplate shingles that force [[jaccardPairs]]'s DF cap
    * sort to the END of the order and never enter the index at high t.
    * The length filter (`t·|y| ≤ |x|`) prunes cross-size pairs before
    * the verify join. Verification recomputes the exact intersection
    * from the full shingle arrays, so no approximation anywhere.
    *
    * Stages: shingle-DF count (one shuffle) → per-doc rank window (one
    * shuffle on id) → prefix self-join (shuffle on shingle, prefix-
    * sized) → distinct candidates → array verify (two id-keyed joins).
    */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 3, threshold: Double = 0.5,
                         workDir: Option[String] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"prefix filtering needs 0 < t <= 1, got $threshold")
    val spark = df.sparkSession
    val sh = shingleArrays(graft.ops.CoreOps.fanOut(df), textCol, idCol, n)
    val pairs = sh.select(col(idCol), explode(col("sh")).as("shingle"))
    val dfreq = pairs.groupBy("shingle").agg(count(lit(1)).as("df"))
    // global token order = (df ASC, shingle ASC): total, corpus-wide,
    // identical for every document — the prefix theorem's requirement.
    // ONE per-doc aggregate carries the (df, shingle)-sorted token list
    // (local array_sort, not a rank window); the prefix cut, the set
    // sizes AND the verify-stage full arrays all project off it. It is
    // MATERIALIZED once to scratch (the PageRank/LabelPropagation
    // stance): three consumers would otherwise re-run the shingling
    // kernel + df join + collect aggregate each. On a cluster the
    // scratch must be a shared FS — `workDir` (or the session
    // checkpoint dir) provides it; the driver-local temp fallback is
    // refused off-local, the connectedComponents stance.
    val scratch = {
      val base = workDir
        .orElse(spark.sparkContext.getCheckpointDir)
        .getOrElse {
          require(spark.sparkContext.isLocal,
            "prefixJaccardPairs on a cluster needs a shared-FS workDir " +
              "(or spark.sparkContext.setCheckpointDir) — a driver-local " +
              "temp dir is invisible to executors")
          graft.ops.CoreOps.scratchDirUnique("prefix_join")
        }
      s"$base/prefix_join_${java.util.UUID.randomUUID().toString.take(8)}"
    }
    pairs.join(dfreq, "shingle")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("toks"))
      .write.mode("overwrite").parquet(s"$scratch/toks")
    val docToks = spark.read.parquet(s"$scratch/toks")
    val prefix = docToks
      .select(col(idCol), expr(
        s"""slice(toks, 1,
           | greatest(1, cast(size(toks) - ceil(size(toks) * $threshold) + 1
           |   as int)))""".stripMargin.replaceAll("\n", "")).as("ptoks"),
        size(col("toks")).cast("long").as("sz"))
      .select(col(idCol), explode(col("ptoks")).as("tok"), col("sz"))
      .select(col(idCol), col("tok.shingle").as("shingle"), col("sz"))
      .repartition(col("shingle"))
    val cands = prefix.select(col(idCol).as("a_id"), col("shingle"),
        col("sz").as("a_sz"))
      .join(prefix.select(col(idCol).as("b_id"), col("shingle"),
        col("sz").as("b_sz")), "shingle")
      .filter(col("a_id") < col("b_id"))
      // length filter: J(x,y) >= t forces t·|y| <= |x| (wlog |x|<=|y|)
      .filter(least(col("a_sz"), col("b_sz")).cast("double") >=
        greatest(col("a_sz"), col("b_sz")) * threshold)
      .select("a_id", "b_id").distinct()
    // TWO-STAGE verify, exact ABSENT 64-bit COLLISIONS. Stage 1
    // intersects 64-bit HASHED token arrays — 8 bytes/token instead of
    // ~25-char strings, an order of magnitude less candidate-join
    // shuffle. With distinct xxhash64 values J_hashed = J_true; a
    // collision between two tokens both in A∩B can in principle LOWER
    // the hashed score ((I-1)/(U-1) < I/U) and drop a qualifying pair,
    // so the filter is sound only up to ~2^-64-per-token-pair collision
    // odds — astronomically safe at any corpus size this engine
    // targets, but stated honestly (r10 advice). Stage 2 recomputes the
    // true string-array Jaccard for the few stage-1 survivors, so every
    // EMITTED score is the exact full-universe value.
    val hashed = docToks.select(col(idCol),
      expr("transform(toks, x -> xxhash64(x.shingle))").as("hs"))
    val stage1 = cands
      .join(hashed.select(col(idCol).as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hashed.select(col(idCol).as("b_id"), col("hs").as("b_hs")), "b_id")
      .filter(
        size(array_intersect(col("a_hs"), col("b_hs"))).cast("double") /
          (size(col("a_hs")) + size(col("b_hs")) -
            size(array_intersect(col("a_hs"), col("b_hs")))) >= threshold)
      .select("a_id", "b_id")
    val arrays = docToks.select(col(idCol),
      expr("transform(toks, x -> x.shingle)").as("sh"))
    stage1
      .join(arrays.select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(arrays.select(col(idCol).as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          (size(col("a_sh")) + size(col("b_sh")) -
            size(array_intersect(col("a_sh"), col("b_sh"))))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** MinHash signature columns: h_i = min over the doc's distinct
    * shingles of xxhash64(seed_i, shingle). One codegen'd kernel call
    * per row (Kernels.minhashSig; subexpression elimination collapses
    * the k column references to a single evaluation) — signatures need
    * NO shuffle; the first shuffle of the LSH pipeline is the band join.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, k: Int = 32,
                        portable: Boolean = false): DataFrame = {
    val sh = shingleArrays(df, textCol, idCol, n)
    val sig =
      if (portable) graft.functions.Kernels.minhashPortableCol(col("sh"), k)
      else graft.functions.Kernels.minhashCol(col("sh"), k)
    sh.select(col(idCol) +: (0 until k).map(i => sig.getItem(i).as(s"h$i")): _*)
  }

  /** LSH banding over the signature: `bands` bands of `k/bands` rows
    * each; docs sharing any band-hash become candidate pairs. The
    * band-hash equi-join replaces the all-pairs comparison — this is the
    * 100 TB path (shuffle keyed on (band, bandHash), skew-safe because
    * identical-band collisions are exactly the near-dup candidates).
    */
  /** LSH band structs `(band, bh)` over signature components addressed
    * by `part(i)` — the ONE place the band layout is defined, shared by
    * [[minhashCandidates]] and the streaming ingest (and mirrored by the
    * generated DuckDB band predicate). Production band key = 8-byte hash
    * of the band's rows (narrow shuffle key); portable mode joins on the
    * row VALUES themselves so the candidate set is exactly
    * band-equality — no cross-engine hash.
    */
  private[graft] def bandStructs(part: Int => Column, k: Int, bands: Int,
                                 portable: Boolean): Seq[Column] = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
    (0 until bands).map { bnd =>
      val parts = (0 until rows).map(r => part(bnd * rows + r))
      val key =
        if (portable) struct(parts.zipWithIndex.map { case (c, r) => c.as(s"r$r") }: _*)
        else xxhash64(parts: _*)
      struct(lit(bnd).as("band"), key.as("bh"))
    }
  }

  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, k: Int = 32, bands: Int = 8,
                        portable: Boolean = false): DataFrame = {
    val sig = minhashSignatures(df, textCol, idCol, n, k, portable)
    val bandCols = bandStructs(i => col(s"h$i"), k, bands, portable)
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
                   threshold: Double = 0.5,
                   portable: Boolean = false): DataFrame = {
    val cand = minhashCandidates(df, textCol, idCol, n, k, bands, portable)
    val sh = shingleArrays(df, textCol, idCol, n)
    val s = sh.select(col(idCol), explode(col("sh")).as("shingle"))
    val sizes = sh.select(col(idCol), size(col("sh")).cast("long").as("sz"))
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
    * by token-hash bit i; fingerprint bit i = (sum_i > 0). One codegen'd
    * kernel call per row (Kernels.simhash64) — tokenize, xxhash64 (same
    * seed-42 hash as Spark's `xxhash64`), bit-vote and pack in a single
    * pass with no explode and no shuffle.
    */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.Kernels.simhashCol(col(textCol)).as("simhash"))

  /** Portable 48-bit SimHash (md5-derived token hashes — reproducible by
    * the DuckDB oracle; see [[PortableHash]]). Same vote/pack semantics
    * as [[simhash64]].
    */
  def simhash48(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.Kernels.simhash48Col(col(textCol)).as("simhash"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash-banded near-dup pairs: split the 64-bit fingerprint into
    * `bands` equal bit-bands; docs sharing ANY band become candidates
    * (an exact-match equi-join — near-dups within hamming distance
    * `64/bands - 1` of each other are guaranteed to collide on ≥1 band
    * by pigeonhole), then verify with the full hamming distance. Same
    * candidates→verify shape as MinHash-LSH, but band keys are bit
    * slices, not hashes.
    */
  def simhashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 6, bands: Int = 8,
                     portable: Boolean = false): DataFrame = {
    val bits = if (portable) PortableHash.SimhashBits else 64
    require(bits % bands == 0, s"bands must divide $bits")
    // the oracle for the portable form has no band logic — it relies on
    // the band join being LOSSLESS for qualifying pairs, which pigeonhole
    // only guarantees when bands > maxHamming. The production path may
    // trade recall for fewer bands.
    require(!portable || maxHamming < bands,
      "portable mode needs bands > maxHamming (pigeonhole-lossless)")
    val width = bits / bands
    val fp = if (portable) simhash48(df, textCol, idCol)
             else simhash64(df, textCol, idCol)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width)
          .bitwiseAND((1L << width) - 1L).as("bits"))
    }
    val banded = fp.select(col(idCol), col("simhash"),
      explode(array(bandCols: _*)).as("k"))
      .select(col(idCol), col("simhash"), col("k.band").as("band"),
        col("k.bits").as("bits"))
    banded.as("x").join(banded.as("y"), Seq("band", "bits"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"),
        col("x.simhash").as("a_fp"), col("y.simhash").as("b_fp"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        hamming64(col("a_fp"), col("b_fp")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
  }

  /** Edit-distance near-duplicate pairs: SimHash-band candidates verified
    * by Levenshtein distance on a fixed-length text prefix. Hamming on
    * the fingerprint is a bag-of-words similarity; the edit-distance
    * verify adds an ORDER-sensitive metric (insertion/deletion/
    * substitution cost), which separates true re-edits from
    * word-shuffled rewrites.
    * `bands > maxHamming` keeps the band join pigeonhole-lossless for
    * qualifying pairs, so the oracle is the plain all-pairs predicate
    * with no band logic. The candidate join carries only (id, simhash);
    * the prefixes (bounded `prefixLen` chars, not the full document)
    * rejoin AFTER the pair dedup — at corpus scale neither the band
    * shuffle nor the verify join ever moves full texts.
    */
  def editDistanceNearDup(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3, bands: Int = 4,
                          prefixLen: Int = 96, maxEdit: Int = 48): DataFrame = {
    require(maxHamming < bands,
      "bands > maxHamming (pigeonhole-lossless, see simhashNearDup)")
    val cand = simhashNearDup(df, textCol, idCol, maxHamming, bands,
      portable = true)
    val pre = df.select(col(idCol),
      substring(col(textCol), 1, prefixLen).as("__prefix"))
    cand
      .join(pre.select(col(idCol).as("a_id"), col("__prefix").as("__ap")), "a_id")
      .join(pre.select(col(idCol).as("b_id"), col("__prefix").as("__bp")), "b_id")
      .select(col("a_id"), col("b_id"), col("hamming"),
        levenshtein(col("__ap"), col("__bp")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxEdit)
      .orderBy("a_id", "b_id")
  }

  /** Connected components over an undirected pair list `(a_id, b_id)` —
    * duplicate-CLUSTER resolution: every doc in a component gets the
    * component's minimum id as its label, so "keep one per cluster"
    * is `label == id`.
    *
    * Algorithm: iterative min-label propagation (each round every node
    * takes the min label in its neighborhood; converges in O(diameter)
    * rounds — near-dup clusters are tiny-diameter in practice). Each
    * round is one shuffle on node id; the driver only sees a change
    * COUNT per round (no graph collect). This is the DataFrame form of
    * the standard large-star/small-star CC used by production dedup.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id", maxIter: Int = 20,
                          workDir: Option[String] = None): DataFrame = {
    // RELIABLE per-round materialization (not localCheckpoint): iterative
    // lineage must survive executor loss — blocks stored on executors die
    // with them, which on a 1000-executor cluster means some round's
    // partition is gone before convergence. Rounds persist as parquet
    // under `workDir` (pass an HDFS/object-store path on a cluster; the
    // session checkpoint dir, then a driver temp dir, are the fallbacks —
    // the latter only works in local mode), and each round's files are
    // DELETED once the next round lands, so a long job leaks nothing but
    // the final labels (cleaned when the work dir is).
    val spark = pairs.sparkSession
    val base = workDir
      .orElse(spark.sparkContext.getCheckpointDir)
      .getOrElse {
        require(spark.sparkContext.isLocal,
          "connectedComponents on a cluster needs a shared-FS workDir " +
            "(or spark.sparkContext.setCheckpointDir)")
        java.nio.file.Files.createTempDirectory("graft_cc_").toString
      }
    val dir = s"$base/cc_${java.util.UUID.randomUUID().toString.take(8)}"
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    def rm(p: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(hadoopConf).delete(path, true): Unit
    }
    def materialize(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$dir/$name")
      spark.read.parquet(s"$dir/$name")
    }
    // materialize the edge list ONCE — otherwise every iteration's joins
    // recompute the (possibly expensive) pair-generation pipeline
    val edges = materialize(
      pairs.select(col(aCol).as("x"), col(bCol).as("y"))
        .union(pairs.select(col(bCol).as("x"), col(aCol).as("y"))), "edges")
    var labels = materialize(
      edges.select(col("x").as("id")).distinct()
        .withColumn("label", col("id")), "labels_0")
    // label tables are |V| rows of 2 longs: as with the PageRank rank
    // table, per-round cost at small |V| is dominated by
    // shuffle-partition-many tiny files, so each round's write
    // coalesces to a node-scaled count (the count reads the tiny
    // stored labels_0, not the pair pipeline). NOTE the coalesce
    // narrows the round's FINAL reduce stage (the pointer-jump join's
    // reduce side runs at labelFiles tasks, not just the write) —
    // accepted over an extra per-round repartition shuffle because
    // labelFiles scales 1-per-2M-nodes, bounding that stage at ~2M
    // two-long rows per task up to the 256-file cap.
    val labelFiles =
      math.max(1L, math.min(256L, labels.count() / 2000000L)).toInt
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "y")
          .withColumnRenamed("label", "y_label"), "y")
        .groupBy(col("x").as("id"))
        .agg(min(col("y_label")).as("nbr_label"))
      val stepped = labels.withColumnRenamed("label", "old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nbr_label"), col("old"))).as("label"),
          col("old"))
      // pointer jumping: compress label ← min(label, prev_label(label))
      // before storing. A label is always a node id in the same
      // component, so the lookup join is safe, and taking the min keeps
      // labels monotonically decreasing toward the component min. Each
      // round then propagates ~2 hops instead of 1 — O(log diameter)
      // rounds instead of O(diameter), which at 100 TB is the
      // difference between 5 and 30 shuffle rounds on a chain-shaped
      // duplicate cluster. The lookup side reads the MATERIALIZED
      // previous round (`labels`), not `stepped`: joining `stepped` to a
      // projection of itself would plan the edge-join pipeline twice per
      // round (only identical exchanges get reused, not the operators
      // above them), silently doubling the dominant per-round cost.
      val lookup = labels.select(col("id").as("label"),
        col("label").as("label2"))
      // one materialization per round carries BOTH the new label and the
      // old one, so change-detection reads stored data, not the plan
      val next = materialize(
        stepped.join(lookup, Seq("label"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("label2"), col("label")))
              .as("label"),
            col("old"))
          .coalesce(labelFiles), s"labels_${iter + 1}")
      converged = next.filter(col("label") =!= col("old")).isEmpty
      labels = next.select("id", "label")
      rm(s"$dir/labels_$iter")
      iter += 1
    }
    rm(s"$dir/edges")
    labels.select(col("id"), col("label").as("component"))
  }
}
