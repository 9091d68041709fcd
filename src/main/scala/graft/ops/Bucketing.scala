package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) table layout — the shuffle-free join path
  * (SURVEY §4: "bucketing for co-located joins").
  *
  * A join between two tables bucketed on the join key with the SAME
  * bucket count reads bucket i of each side into the same task: the
  * sort-merge join runs with NO Exchange on either side. At 100 TB this
  * is the difference between re-shuffling the fact table on every run
  * and paying the shuffle ONCE at layout time — the standard warehouse
  * trick for a fact table joined on the same key by many queries
  * (lineitem ⨝ orders on orderkey here).
  *
  * The reference has no layout control at all (it row-streams INSERTs,
  * mysql_to_clickhouse_sync.py:92-108); this is the Spark-native answer
  * to the same "repeated big join" workload.
  */
object Bucketing {

  /** The session catalog is in-memory: a table written by a PREVIOUS
    * session is gone from the catalog but its warehouse directory
    * survives, and a fresh `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS. Drop the catalog entry and clear any
    * orphaned location before (re)writing a layout.
    */
  private def clearStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Write `df` as a bucketed+sorted managed table (overwriting any
    * previous layout). Bucket files are sorted on the key, so the
    * bucketed join needs no Sort either when one file per bucket exists.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    clearStale(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** [[writeBucketed]] only when the table isn't already in the session
    * catalog — the pay-the-shuffle-ONCE contract: a repeated query run
    * (bench priming + timed run, or many queries sharing a layout)
    * reuses the existing layout instead of rebuilding it. A table left
    * on disk by a PREVIOUS session is not in the in-memory catalog, so
    * a fresh session still rebuilds (through [[clearStale]]).
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, key, buckets)

  /** Write `df` as a directory-partitioned managed table: one directory
    * per distinct `partCol` value. A reader filtering on the partition
    * column never opens the other directories (partition pruning — the
    * plan's `PartitionFilters`), so a 100 TB table filtered to one
    * partition costs one partition's scan, not a full pass + filter.
    */
  def writePartitioned(df: DataFrame, table: String, partCol: String): Unit = {
    clearStale(df.sparkSession, table)
    df.write.mode("overwrite").partitionBy(partCol).saveAsTable(table)
  }

  /** [[writePartitioned]] only when absent from the session catalog —
    * same pay-once economics as [[ensureBucketed]].
    */
  def ensurePartitioned(df: DataFrame, table: String, partCol: String): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writePartitioned(df, table, partCol)

  /** Write `df` Z-ORDERED on two integer keys: range-partitioned and
    * sorted by the Morton interleave of (c1, c2), so rows close in BOTH
    * dimensions land in the same files/row groups. Parquet min/max
    * footer stats on c1 AND c2 then both prune a two-column range
    * predicate — a linear sort on either column alone scatters the
    * other across every file. At 100 TB this is the standard lakehouse
    * answer to "two selective dimensions, one layout"; like bucketing,
    * the curve sort is paid ONCE at layout time. The z column is kept
    * in the table (a reader projecting the original columns never
    * decodes it — columnar pruning makes it free).
    */
  def writeZOrdered(df: DataFrame, table: String, c1: String, c2: String,
                    files: Int): Unit = {
    clearStale(df.sparkSession, table)
    // Range-normalize BOTH keys to 16 bits before interleaving: raw
    // interleave lets the wider-domain key own the high curve bits (an
    // 8-bit × 4-bit domain sorts almost purely by the first key), which
    // silently degenerates to a linear sort. min/max are 2 scalars per
    // column — footer-stats cheap, the bounded-driver-data exception
    // IVF centroids already use.
    val Seq(lo1, hi1, lo2, hi2) = {
      val r = df.agg(min(col(c1)).cast("long"), max(col(c1)).cast("long"),
        min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
      Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def norm(c: String, lo: Long, hi: Long) =
      floor((col(c).cast("long") - lit(lo)) * lit(65536.0)
        / lit((hi - lo + 1).toDouble)).cast("long")
    // internal key name: a user column named plainly "z" must survive
    val zCol = "__graft_z"
    df.withColumn(zCol,
        graft.functions.Kernels.morton2Col(norm(c1, lo1, hi1),
          norm(c2, lo2, hi2)))
      .repartitionByRange(files, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
      .write.mode("overwrite").saveAsTable(table)
  }

  /** [[writeZOrdered]] only when absent from the session catalog. */
  def ensureZOrdered(df: DataFrame, table: String, c1: String, c2: String,
                     files: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeZOrdered(df, table, c1, c2, files)

  /** Plain managed-table (re)write with the same stale-location
    * hygiene as the layout writers — for small dims that feed
    * runtime-pruning joins.
    */
  def replaceTable(spark: SparkSession, table: String, df: DataFrame): Unit = {
    clearStale(spark, table)
    df.write.mode("overwrite").saveAsTable(table)
  }

  /** Small-file compaction — the table-maintenance pass every
    * long-lived ingest needs: streaming sinks, CDC applies, and
    * per-batch appends accrete files far below the scan-efficient size,
    * and at 100 TB the file LISTING alone (plus one task per tiny file)
    * comes to dominate reads. Rewrites a parquet directory into
    * ceil(bytes / targetFileBytes) files: read with the existing
    * schema, coalesce (no shuffle — merging files needs no
    * repartitioning, and coalesce keeps the rewrite a pure scan→sink
    * copy like the sync path), stage the result in a sibling dir, then
    * swap with the same rename discipline as the CDC state merge
    * (stage → `__old` → prune; every rename checked). Returns
    * (filesBefore, filesAfter). Content identity under compaction is
    * spec-pinned with the order-independent `sync.Validate` digest.
    *
    * CONCURRENCY CONTRACT — single writer, no concurrent readers: the
    * two renames are not atomic together, so between `path→__old` and
    * `__compacting→path` the directory is briefly absent, and after a
    * mid-swap crash it stays absent until the next compact() call runs
    * the heal below. This is the standard posture for a table-
    * maintenance pass (run it in the ingest's own maintenance window);
    * readers that must survive a concurrent compaction belong on a
    * table format with a commit log, not raw directory parquet.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    // heal a mid-swap crash (the window between the two renames below:
    // the data lives only at __old, the target is gone) — same recovery
    // stance as the CDC state merge's recoverBuckets
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"compact: could not restore $dir")
    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles.length
    val bytes = dataFiles.map(_.getLen).sum
    val target = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (before <= target) return (before, before)
    val staged = new org.apache.hadoop.fs.Path(dir + "__compacting")
    fs.delete(staged, true); fs.delete(old, true)
    spark.read.parquet(dir).coalesce(target)
      .write.mode("overwrite").parquet(staged.toString)
    require(fs.rename(path, old), s"compact: could not stage out $dir")
    require(fs.rename(staged, path), s"compact: could not publish $staged")
    fs.delete(old, true)
    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (before, after)
  }

  /** Bucket-aware inner equi-join of two saved bucketed tables. The
    * `merge` hint pins the sort-merge strategy (AQE would otherwise
    * broadcast a small side at test scale, hiding the layout win the
    * plan test asserts: zero Exchange under the join).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, leftKey: String,
                   rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"),
        col(leftKey) === col(rightKey))
}
