package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the most recent
  * right row with `right.ts <= left.ts` for the same key — the canonical
  * time-series/CDC lookup Spark has no built-in operator for (SURVEY
  * §2.3's anticipated [EXT] custom operator).
  *
  * Implementation is the scalable union+window pattern, NOT a range
  * cross-join: tag both sides, union, then one window pass per key in
  * event-time order carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)`) onto each left row. Cost = one shuffle on
  * the key + one sort within partitions — the same shape as any windowed
  * aggregation, so it scales like one. Ties at equal `ts` order the
  * right row first (inclusive `<=` semantics, matching ASOF JOIN in
  * engines that have it natively).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its `valueCols` get attached)
    * @param keyCol     equi-key on both sides
    * @param tsCol      event-time column name on both sides
    * @param leftCols   left columns to carry into the output
    * @param valueCols  right columns to attach (as-of values; null when
    *                   no right row precedes the left row)
    * @param leftTie    total-order tiebreak column within equal
    *                   (key, ts) on the left side (deterministic output)
    * @param rightTie   same for the right side
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           leftCols: Seq[String], valueCols: Seq[String],
           leftTie: String, rightTie: String): DataFrame = {
    val lTagged = left.select(
      (col(keyCol) +: col(tsCol) +: lit(1).as("__side") +: col(leftTie).cast("long").as("__tb") +:
        (leftCols.map(col) ++ valueCols.map(c => lit(null).cast(
          right.schema(c).dataType).as(c)))): _*)
    val rTagged = right.select(
      (col(keyCol) +: col(tsCol) +: lit(0).as("__side") +: col(rightTie).cast("long").as("__tb") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(col))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] = valueCols.map(c =>
      last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w)
        .as(s"asof_$c"))
    lTagged.unionByName(rTagged)
      .select((col(keyCol) +: col(tsCol) +: col("__side") +:
        leftCols.map(col)) ++ carried: _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
