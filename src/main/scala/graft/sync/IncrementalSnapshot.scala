package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-based incremental snapshot (the DBLog algorithm —
  * Andreakis & Papapanagiotou, "DBLog: A Watermark Based Change-Data-
  * Capture Framework", arXiv:2010.12597; the same shape Debezium ships
  * as "incremental snapshots"): interleave a chunked table copy with a
  * LIVE binlog tail, so a 100 TB initial sync never stops replication
  * and never needs a table lock or a consistent-read transaction held
  * open for hours.
  *
  * The reference does the opposite — a full snapshot fenced by ONE
  * `SHOW MASTER STATUS` coordinate before any copy starts
  * (mysql_to_clickhouse_sync sync.py:175-181), which is only consistent
  * if the source is quiesced for the whole copy. DBLog's insight: fence
  * EVERY chunk with its own log coordinates instead. Per chunk —
  * record the log position L (low watermark), read the chunk, record H
  * (high watermark); any key whose log events fall in (L, H] is
  * ambiguous inside the chunk image (the read may or may not have seen
  * the change), so the LOG version must win for it. Keys the log never
  * touches after L keep their chunk image.
  *
  * Batch formulation (this module): tag each surviving chunk row with
  * version = its chunk's L; tag each change event with version = its
  * log coordinate; per key, the highest version wins, with the chunk
  * row winning ties (the watermark is written BEFORE the read, so an
  * event AT L is already reflected in the image); a winning delete
  * erases the key. That one union + window collapse subsumes both
  * DBLog's in-window eviction (an event in (L, H] outranks the chunk
  * row) and the post-snapshot tail (events after H outrank everything),
  * with no driver-side chunk buffer at all.
  *
  * Scale shape: one shuffle on the key, one `row_number` window — the
  * same ReplacingMergeTree collapse the CDC surface already uses
  * (`st_cdc_binlog_*`). Chunk images and the log tail stream through;
  * nothing is collected.
  */
object IncrementalSnapshot {

  /** Merge chunked snapshot images with change events into final state.
    *
    * @param snapshot one row per (key, chunk): the chunk's image of the
    *   key, carrying `versionCol` = the chunk's LOW watermark (the log
    *   coordinate recorded immediately before the chunk was read).
    *   Must NOT carry `opCol` — snapshot rows are implicitly upserts.
    * @param changes  decoded log events carrying `versionCol` = the
    *   event's log coordinate and `opCol` ∈ insert/update/delete.
    *   Payload columns must align with `snapshot` (same names/types);
    *   `unionByName` enforces it loudly.
    * @param keyCols  the identity of a row; include the source/server
    *   column when log coordinates are only comparable per source.
    */
  def merge(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
            versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(!snapshot.columns.contains(opCol),
      s"snapshot rows must not carry '$opCol' (they are implicit upserts)")
    val s = snapshot
      .withColumn(opCol, lit("snapshot"))
      .withColumn("_prio", lit(1))
    val c = changes.withColumn("_prio", lit(0))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_prio").desc)
    s.unionByName(c)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "delete")
      .drop("_rn", "_prio")
  }
}
