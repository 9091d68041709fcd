package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Staged-swap compaction for `batch_id=N` partial-state layouts whose
  * merge is SUM-SHAPED (duplicate-sensitive): re-reading a partial
  * twice double-counts, so the swap must be exactly-once. This is the
  * protocol [[CmSketchIngest]] proved out, extracted once so every
  * sum-merged state (CM cells, cluster profiles) shares one
  * implementation; OR/DISTINCT-merged states ([[BloomIngest]],
  * [[NearDupIngest]]) keep their simpler duplicate-tolerant swap.
  *
  * Invariants: the newest batch dir is never touched (an at-least-once
  * replay of it stays idempotent via its own overwrite); everything
  * older merges into the second-newest id; the `__old` marker appears
  * only after staging is fully written, so [[recover]] is
  * deterministic at any crash point.
  */
object BatchState {

  private val BatchDirRe = "^batch_id=(\\d+)$".r
  private val OldDirRe = "^batch_id=(\\d+)__old$".r

  /** Merge every batch partial except the newest into one partial at
    * the second-newest id and drop the rest. `merge` reduces the
    * filtered state (all columns incl. `batch_id`) to the replacement
    * partial's rows. No-op below 3 batch dirs.
    */
  def compact(spark: SparkSession, stateDir: String,
              merge: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    recover(spark, stateDir)
    def rename(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"compact: rename $src -> $dst failed")
    val ids = fs.listStatus(root).map(_.getPath.getName).collect {
      case BatchDirRe(id) => id.toLong
    }.sorted
    if (ids.length < 3) return
    val newest = ids.last
    val target = ids(ids.length - 2)
    val merged = merge(spark.read.parquet(stateDir)
      .filter(col("batch_id") =!= newest))
    val staging = new Path(root, "_compact_tmp")
    fs.delete(staging, true)
    merged.write.mode("overwrite").parquet(staging.toString)
    rename(new Path(root, s"batch_id=$target"),
      new Path(root, s"batch_id=${target}__old"))
    ids.dropRight(2).foreach(id =>
      fs.delete(new Path(root, s"batch_id=$id"), true))
    rename(staging, new Path(root, s"batch_id=$target"))
    fs.delete(new Path(root, s"batch_id=${target}__old"), true)
  }

  /** Finish an interrupted [[compact]]. The `__old` marker names the
    * target id, and the staging dir is always fully written before the
    * marker appears, so recovery is deterministic: re-delete older
    * dirs, install staging if the target is missing, drop the marker.
    * Without a marker, a leftover staging dir is from a pre-marker
    * crash — its content was never cut over, so it is simply dropped.
    */
  def recover(spark: SparkSession, stateDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).map(_.getPath.getName)
    val staging = new Path(root, "_compact_tmp")
    names.collectFirst { case OldDirRe(t) => t.toLong } match {
      case Some(target) =>
        names.collect { case BatchDirRe(id) if id.toLong < target => id.toLong }
          .foreach(id => fs.delete(new Path(root, s"batch_id=$id"), true))
        val live = new Path(root, s"batch_id=$target")
        if (!fs.exists(live)) {
          if (!fs.rename(staging, live))
            throw new java.io.IOException(
              s"recover: rename $staging -> $live failed")
        } else fs.delete(staging, true)
        fs.delete(new Path(root, s"batch_id=${target}__old"), true)
      case None =>
        fs.delete(staging, true)
    }
  }
}
