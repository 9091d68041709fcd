package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.DriverManager
import java.util.Properties

/** The reference program, end to end, against real databases: discover
  * tables over JDBC metadata (`SHOW TABLES`, sync.py:155), regex-filter
  * (sync.py:143-144), probe PK bounds (`IFNULL(MIN/MAX)`, sync.py:163),
  * pick a strategy per table (ChunkPlanner), copy with range-partitioned
  * reads and batched PreparedStatement writes, and record the per-table
  * high-water offsets (the metadata.txt analog, sync.py:175-181).
  *
  * Differences from the reference, by design (SURVEY §3.4): half-open
  * chunks (no duplicate boundary rows), failures propagate, values never
  * pass through SQL strings. Works against any JDBC pair — exercised in
  * tests with embedded Derby on both sides; MySQL→ClickHouse is the same
  * code with different URLs/drivers.
  */
object JdbcSyncJob {

  final case class Endpoint(url: String, props: Properties = new Properties())

  /** S3 catalog scan via DatabaseMetaData (driver-side, metadata only). */
  def discoverTables(ep: Endpoint, schema: Option[String] = None): Seq[String] = {
    val conn = DriverManager.getConnection(ep.url, ep.props)
    try {
      val rs = conn.getMetaData.getTables(null, schema.orNull, "%",
        Array("TABLE"))
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) names += rs.getString("TABLE_NAME")
      names.sorted.toSeq
    } finally conn.close()
  }

  /** A1 bounds + real count as ONE driver-side aggregate query on the
    * source — the reference's `SELECT IFNULL(MIN/MAX(_rowid),0)` plus
    * COUNT (sync.py:163-166) verbatim; never a row transfer. (A
    * `spark.read.jdbc(...).agg(...)` would fetch the whole table: DSv1
    * JDBC does not push aggregates.)
    */
  def boundsAndCount(ep: Endpoint, table: String, pk: String): (Long, Long, Long) = {
    val conn = DriverManager.getConnection(ep.url, ep.props)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT COALESCE(MIN($pk), 0), COALESCE(MAX($pk), 0), COUNT(*) FROM $table")
      rs.next()
      (rs.getLong(1), rs.getLong(2), rs.getLong(3))
    } finally conn.close()
  }

  /** Copy one table src→dst with the planned strategy. Tables without a
    * usable PK take the single-partition fallback (the reference's
    * LIMIT-pagination path, pagination.py:130-142) instead of being
    * skipped. Empty tables still create the destination table.
    */
  def syncTable(spark: SparkSession, src: Endpoint, dst: Endpoint,
                table: String, pk: Option[String],
                cfg: SyncJob.SyncConfig = SyncJob.SyncConfig()): SyncJob.TableReport = {
    val (lo, hi, cnt) = pk match {
      case Some(k) => boundsAndCount(src, table, k)
      case None =>
        val conn = DriverManager.getConnection(src.url, src.props)
        try {
          val rs = conn.createStatement()
            .executeQuery(s"SELECT COUNT(*) FROM $table")
          rs.next(); (0L, 0L, rs.getLong(1))
        } finally conn.close()
    }
    val strategy = ChunkPlanner.plan((lo, hi), cnt, hasAutoInc = pk.isDefined,
      cfg.batchSize, cfg.smallTableThreshold)
    val (df, parts) = strategy match {
      case ChunkPlanner.Empty =>
        (JdbcSource.read(spark, src.url, table, src.props).limit(0), 1)
      case ChunkPlanner.SingleRow | ChunkPlanner.Paginated =>
        (JdbcSource.read(spark, src.url, table, src.props), 1)
      case ChunkPlanner.RangeChunks(_) =>
        val n = ChunkPlanner.numPartitions(cnt, cfg.batchSize, cfg.maxPartitions)
        (JdbcSource.rangePartitionedRead(spark, src.url, table, pk.get, lo, hi,
          n, src.props), n)
    }
    // write even when empty so the destination table exists
    Sinks.jdbc(df, dst.url, table, dst.props, batchSize = cfg.batchSize.toInt)
    SyncJob.TableReport(table, cnt, lo, hi,
      strategy.getClass.getSimpleName.stripSuffix("$"), parts)
  }

  /** Full run over the filtered catalog; writes the offsets checkpoint
    * to `checkpointDir` and returns the per-table report. Tables with no
    * known PK are still copied (single-partition fallback).
    */
  def run(spark: SparkSession, src: Endpoint, dst: Endpoint,
          pkFor: String => Option[String], checkpointDir: String,
          cfg: SyncJob.SyncConfig = SyncJob.SyncConfig(),
          schema: Option[String] = None): DataFrame = {
    import spark.implicits._
    val tables = SyncJob.filterTables(discoverTables(src, schema),
      cfg.includeTables, cfg.excludeTables)
    val reports = tables.map(t => syncTable(spark, src, dst, t, pkFor(t), cfg))
    SyncJob.writeCheckpoint(checkpointDir, reports)
    reports.toDF().orderBy("table")
  }
}
