package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-sync content validation: did the copy arrive intact?
  *
  * The reference offers no way to check a finished sync (errors during
  * insert are even logged-and-swallowed, sync.py:87-89) — the operative
  * question for its user, "does ClickHouse now equal MySQL?", goes
  * unanswered. This is that check, shaped for scale: each side computes
  * one ORDER- and PARTITION-independent digest — the exact-decimal SUM
  * of a portable 48-bit hash over each row's canonical rendering — so
  * validating a 100 TB table costs one full scan per side and ships 16
  * bytes over the wire, instead of re-reading either table through a
  * row comparator. The hash is [[graft.functions.Kernels.md5_48]] (the
  * cross-engine family of graft.sim.PortableHash), so ANY engine that
  * can run md5 — DuckDB, ClickHouse, MySQL — can compute its side
  * without Spark.
  *
  * The sum lives on DECIMAL(38,0): 48-bit terms overflow an int64 sum
  * past ~32M rows, decimal is exact and associative at any row count
  * (same argument as [[graft.ops.CoreOps.exactSum]]).
  */
object Validate {

  /** Canonical field rendering: cast to string, escape the escape char
    * and the field separator (backslash-doubling, so escaped output
    * only ever contains EVEN runs of backslashes), NULL → the lone
    * `\N` sentinel (odd single backslash — unreachable by escaping,
    * so a NULL can never collide with any real value, and a value
    * containing the separator can never shift a field boundary:
    * rows ('a|b','c') and ('a','b|c') digest differently).
    */
  def canonicalField(c: Column): Column =
    coalesce(
      graft.functions.Kernels.escapeCanonicalCol(c.cast("string")),
      lit("\\N"))

  /** Canonical row rendering: escaped fields joined with '|'. Callers
    * pass pre-rendered columns (dates through date_format, doubles
    * through a fixed grid) when engine defaults differ.
    */
  def canonicalRow(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(canonicalField): _*)

  /** (n_rows, digest) of a table under the canonical rendering.
    *
    * The digest is summed on DECIMAL(38,0) internally but EMITTED as a
    * string: a decimal survives every engine's parquet writer, but its
    * client-side rendering does not (pyarrow yields an exact Decimal,
    * DuckDB's pandas bridge yields float64 — two spellings of the same
    * value). A digest exists only to be compared, so the output column
    * is the one canonical spelling every engine agrees on.
    */
  def contentDigest(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(graft.functions.Kernels.md5_48Col(canonicalRow(cols)).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("digest"))
}
