package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Kernels
import graft.sim.DedupOps

/** Streaming near-duplicate INGEST ([EXT] X1 × St2): the online form of
  * the MinHash-LSH batch dedup — each arriving document is judged
  * against everything already ingested, emitting
  * `(doc_id, is_dup, dup_of)` per micro-batch.
  *
  * Decision rule (identical in the stream and the batch twin): a doc is
  * a duplicate iff some EARLIER doc shares ≥1 LSH band AND the
  * signature-estimated Jaccard (fraction of equal MinHash components —
  * each matches with probability J) is ≥ `threshold`; `dup_of` is the
  * smallest such doc id. Signatures are the portable md5-derived kind
  * ([[graft.sim.PortableHash]]), so the batch twin is DuckDB-oracled and
  * the stream is pinned to the twin in ScalaTest.
  *
  * Scale shape: state is ONLY signatures+band keys (k longs per doc —
  * never text or shingles), laid out as a bucket-partitioned parquet
  * table (`batch_id=N/bucket=B/`). A micro-batch prunes its state read
  * to the buckets its own band keys hash into — apply cost follows the
  * batch's key spread, not corpus size — and candidate joins are band
  * equi-joins, never all-pairs. Per-batch rewrites land in the batch's
  * own partition with overwrite, so foreachBatch replays (at-least-once)
  * are idempotent.
  */
object NearDupIngest {

  val StateBuckets = 64

  /** Per-doc portable MinHash signature as one array column. */
  def sigTable(docs: DataFrame, textCol: String, idCol: String,
               n: Int, k: Int): DataFrame =
    DedupOps.shingleArrays(docs, textCol, idCol, n)
      .select(col(idCol).as("doc_id"),
        Kernels.minhashPortableCol(col("sh"), k).as("sig"))

  /** Explode a signature table into band rows `(doc_id, sig, band, bh,
    * bucket)` — `bh` is the band's raw component values (the join key),
    * `bucket` its stable partition-pruning bucket. Band layout comes
    * from [[DedupOps.bandStructs]] — the same single source of truth the
    * batch candidates and the generated DuckDB band predicate use.
    */
  def bandRows(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val bandCols = DedupOps.bandStructs(i => col("sig").getItem(i), k, bands,
      portable = true)
    sigs.select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("sig"),
        col("b.band").as("band"), col("b.bh").as("bh"))
      .withColumn("bucket",
        pmod(xxhash64(col("band"), col("bh")), lit(StateBuckets)).cast("int"))
  }

  /** Candidate pairs between two band-row sets: band equi-join, then the
    * signature-match estimate. One row per (a_id, b_id) — a pair sharing
    * several bands is counted once. `ordered = true` (for self-joins)
    * keeps only a_id < b_id, BEFORE the estimate projection and the pair
    * dedup shuffle — half the orientations never cost anything.
    */
  private[graft] def estPairs(a: DataFrame, b: DataFrame,
                              ordered: Boolean = false): DataFrame =
    a.select(col("band"), col("bh"), col("doc_id").as("a_id"),
        col("sig").as("a_sig"))
      .join(b.select(col("band"), col("bh"), col("doc_id").as("b_id"),
        col("sig").as("b_sig")), Seq("band", "bh"))
      .filter(if (ordered) col("a_id") < col("b_id")
              else col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        Kernels.sigEqFracCol(col("a_sig"), col("b_sig")).as("est"))
      .dropDuplicates("a_id", "b_id")

  /** Per-doc verdict from est-filtered pairs: one row per id in `ids`
    * (docs too short to shingle are trivially novel — every arriving doc
    * gets a verdict), `is_dup` 0/1, `dup_of` the min matching earlier id
    * (−1 sentinel when novel — the reference's IFNULL convention, and it
    * keeps the column non-null for the oracle).
    */
  private def verdicts(ids: DataFrame, pairs: DataFrame,
                       threshold: Double): DataFrame = {
    val dups = pairs.filter(col("est") >= threshold)
      .groupBy(col("b_id").as("doc_id"))
      .agg(min(col("a_id")).as("dup_match"))
    ids.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_match").isNotNull, 1L).otherwise(0L).as("is_dup"),
        coalesce(col("dup_match"), lit(-1L)).as("dup_of"))
  }

  /** Deterministic batch twin: the whole corpus in one "batch", earlier =
    * smaller doc id. This is the form the DuckDB oracle checks; the
    * streaming path equals it whenever arrival order follows doc id.
    */
  def batchTwin(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", n: Int = 3, k: Int = 16,
                bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val sigs = sigTable(docs, textCol, idCol, n, k)
    val br = bandRows(sigs, k, bands)
    verdicts(docs.select(col(idCol).as("doc_id")),
      estPairs(br, br, ordered = true), threshold)
      .orderBy("doc_id")
  }

  private val BatchDirRe = "^batch_id=(\\d+)$".r

  /** Compact the ingest state: merge every batch partition EXCEPT the
    * newest into the second-newest and drop the rest — a long-running
    * ingest otherwise accumulates one directory per micro-batch and
    * every state read pays an ever-growing file listing.
    *
    * Why the second-newest: the ONLY batch the engine can replay after
    * a crash is the newest one on disk (batch N starts only after N−1's
    * checkpoint committed), and a replayed batch N both filters
    * `batch_id < N` and overwrites its own directory. Folding anything
    * into `batch_id=N` would (a) hide the merged rows from N's replay
    * and (b) let the replay's overwrite destroy them. Dirs < N are
    * committed, so merging into N−1 is always replay-safe.
    *
    * Call between runs (stream stopped): a reader racing the rename
    * pair could transiently see neither dir. A CRASH at any point is
    * recoverable: the swap order is staging-write → rename aside
    * (`__old`) → rename staging in → delete `__old` → delete older
    * dirs, every rename checked (Hadoop signals failure by returning
    * false — an unchecked rename here would delete the only copy);
    * [[recoverState]] — run at the start of every compact AND before
    * every micro-batch state read — heals the mid-swap window, and the
    * later windows only leave rows duplicated between the merged dir
    * and not-yet-deleted older dirs, which candidate-pair dedup and
    * min-verdicts make harmless.
    */
  def compactState(spark: org.apache.spark.sql.SparkSession,
                   stateDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    recoverState(spark, stateDir)
    def rename(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"compactState: rename $src -> $dst failed")
    val ids = fs.listStatus(root).map(_.getPath.getName).collect {
      case BatchDirRe(id) => id.toLong
    }.sorted
    if (ids.length < 3) return
    val target = ids(ids.length - 2)
    val newest = ids.last
    val merged = spark.read.parquet(stateDir)
      .filter(col("batch_id") =!= newest)
      .select("doc_id", "sig", "band", "bh", "bucket")
    val staging = new Path(root, "_compact_tmp")
    fs.delete(staging, true)
    merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.toString)
    val live = new Path(root, s"batch_id=$target")
    val old = new Path(root, s"batch_id=${target}__old")
    rename(live, old)
    rename(staging, live)
    fs.delete(old, true)
    ids.filter(id => id != target && id != newest)
      .foreach(id => fs.delete(new Path(root, s"batch_id=$id"), true))
  }

  /** Heal an interrupted [[compactState]] swap: a `__old` directory with
    * no live sibling is renamed back (the staging rename never
    * happened); with a live sibling it is a superseded copy and is
    * dropped. A leftover `_compact_tmp` is discarded either way (it is
    * re-derivable). Runs before every micro-batch state read — a plain
    * stream restart after a mid-swap crash must not silently lose the
    * set-aside batch (and an unhealed `__old` dir would poison
    * partition inference for `batch_id`).
    */
  def recoverState(spark: org.apache.spark.sql.SparkSession,
                   stateDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith("__old")).foreach { old =>
        val live = new Path(root, old.getName.stripSuffix("__old"))
        if (!fs.exists(live)) {
          if (!fs.rename(old, live))
            throw new java.io.IOException(
              s"recoverState: rename $old -> $live failed")
        } else { fs.delete(old, true); () }
      }
    fs.delete(new Path(root, "_compact_tmp"), true)
    ()
  }

  /** Start the streaming ingest: verdicts land in `outDir/batch_id=N/`,
    * signature state in `stateDir/batch_id=N/bucket=B/`.
    */
  def start(docs: DataFrame, stateDir: String, outDir: String,
            checkpointDir: String, textCol: String = "text",
            idCol: String = "doc_id", n: Int = 3, k: Int = 16,
            bands: Int = 8, threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val newBands = bandRows(sigTable(batch, textCol, idCol, n, k), k, bands)
          .persist()
        try {
          // bounded driver read: ≤ StateBuckets ints — which state
          // partitions this batch can possibly collide with
          val buckets = newBands.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          // heal any interrupted compaction swap BEFORE reading state — a
          // plain restart after a mid-swap crash must see the set-aside
          // batch (and its `__old` dir would poison partition inference)
          recoverState(spark, stateDir)
          // FS-agnostic existence probe — stateDir is an HDFS/object-store
          // path on a cluster, where java.io.File would silently say "no
          // state" and every doc would read as novel
          val statePath = new org.apache.hadoop.fs.Path(stateDir)
          val stateExists = statePath
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(statePath)
          val crossPairs =
            if (stateExists) {
              // batch_id < batchId excludes THIS batch's own rows on a
              // replay; the bucket filter prunes directories, so the
              // state scan is proportional to the batch's key spread
              val prior = spark.read.parquet(stateDir)
                .filter(col("batch_id") < batchId &&
                  col("bucket").isin(buckets: _*))
                .select("doc_id", "sig", "band", "bh")
              estPairs(prior, newBands)
            } else spark.emptyDataFrame
              .withColumn("a_id", lit(0L)).withColumn("b_id", lit(0L))
              .withColumn("est", lit(0.0))
              .select("a_id", "b_id", "est")
          val localPairs = estPairs(newBands, newBands, ordered = true)
          val out = verdicts(
            batch.select(col(idCol).as("doc_id")).distinct(),
            crossPairs.unionByName(localPairs), threshold)
          // overwrite-into-own-partition makes at-least-once replays
          // idempotent for BOTH sinks (same pattern as the CDC apply)
          out.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          newBands.write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$stateDir/batch_id=$batchId")
        } finally { newBands.unpersist(); () }
      }
      .start()
}
