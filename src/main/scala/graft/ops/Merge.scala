package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics on plain DataFrames — the batch upsert primitive
  * every table format (Iceberg/Delta/Hudi, ClickHouse ReplacingMergeTree
  * collapse) exposes, realized as ONE full-outer join on the merge key:
  *
  *   - matched + action 'D'  → row deleted
  *   - matched + action 'U'  → source payload replaces target payload
  *   - unmatched source 'I'  → row inserted
  *   - unmatched target      → row passes through untouched
  *   - unmatched 'U'/'D' and matched 'I' are no-ops (SQL MERGE's
  *     WHEN (NOT) MATCHED guards), not errors — CDC replays routinely
  *     deliver updates for rows already deleted.
  *
  * Scale shape: one shuffle of each side on the merge key (or zero with
  * a bucketed layout — see ops.Bucketing), never a rewrite of untouched
  * rows; the same plan a table format's MERGE compiles to. The
  * streaming twin is CdcPipeline.applyBatch, which additionally prunes
  * the rewrite to touched state buckets.
  *
  * `source` must carry the key column, an `__action` column ('U'|'I'|'D'),
  * and the same payload columns as `target`.
  */
object Merge {

  def mergeInto(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val payload = target.columns.filter(_ != key)
    require(payload.forall(source.columns.contains),
      s"source must carry target payload columns ${payload.mkString(",")}")
    val t = target.select(col(key).as("__tk"),
      struct(payload.map(col): _*).as("__tp"))
    val s = source.select(col(key).as("__sk"), col("__action"),
      struct(payload.map(col): _*).as("__sp"))
    // target-only rows carry a NULL __action out of the outer join —
    // coalesce to a sentinel so the keep-predicate stays two-valued
    // (a raw `__action =!= "D"` is NULL there and would DROP the row)
    val act = coalesce(col("__action"), lit("~"))
    t.join(s, col("__tk") === col("__sk"), "full_outer")
      .filter(
        // drop: matched deletes, and source-only rows that aren't inserts
        !(col("__tk").isNotNull && act === "D") &&
          !(col("__tk").isNull && act =!= "I"))
      .select(
        coalesce(col("__tk"), col("__sk")).as(key),
        // matched update or unmatched insert takes the source payload;
        // everything else keeps the target's
        when(col("__action") === "U" && col("__tk").isNotNull, col("__sp"))
          .when(col("__action") === "I" && col("__tk").isNull, col("__sp"))
          .otherwise(col("__tp")).as("__p"))
      .select(col(key) +: payload.map(c => col(s"__p.$c").as(c)): _*)
  }
}
