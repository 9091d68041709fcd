package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the harness parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference discovers tables at runtime via `SHOW TABLES`
  * (mysql_to_clickhouse_sync.py:155); here the catalog is the set of
  * parquet files in an sf directory. All reads go through
  * `spark.read.parquet` so Catalyst gets column pruning + filter
  * pushdown on every query.
  */
/** Typed row for the typed-Dataset surface (SURVEY §1.4: `Dataset[T]`
  * where a fixed schema benefits from compile-time field checks).
  */
final case class LineitemSlim(l_returnflag: String, l_quantity: Double)

object Tables {
  /** The full harness catalog (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spark 4 rejects parquet TIMESTAMP(NANOS) columns unless they're
    * read as raw nanosecond longs; harmless when no nanos column exists.
    * [[events]] then rebuilds a microsecond timestamp with exact integer
    * division (`DIV`, not `/` — ns epochs exceed double's 53-bit
    * mantissa).
    */
  def ensureNanosCompat(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosCompat(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (read as a
    * nanosecond long under [[ensureNanosCompat]]) and as TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ) across testdata
    * generations — normalize whatever arrived to session-local
    * TimestampType so every downstream query sees one shape. The session
    * timezone is pinned to UTC everywhere (Bench/Verify/specs), which
    * makes the NTZ→LTZ cast value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
