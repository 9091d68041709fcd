package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.CoreOps

/** Harness `events` table → a fleet of REAL binlog files, one per
  * simulated source server (St2 fixture-encode step). In production the
  * binlog comes FROM the MySQL servers; in-sandbox this encode step is
  * the recorded-log stand-in, and everything downstream of the files —
  * [[MysqlBinlog]] wire parsing, [[MysqlBinlogSource]] scan,
  * [[CdcPipeline]] apply — is exactly what would run against a
  * server-produced log.
  *
  * Scale shape: the encode is a `foreachPartition` over a deterministic
  * hash repartition on the table key — no driver materialization, one
  * writer per partition, the same "one serial log per server, many
  * servers" layout a 100 TB deployment has. Rows are written as
  * WRITE_ROWS v2 in ≤64-row statements, each preceded by its TABLE_MAP
  * (MySQL's own per-statement layout) and fenced by an XID.
  */
object MysqlBinlogFixture {
  import MysqlBinlogWriter._

  /** The `events` table's binlog column layout (first column = the CDC
    * key, matching [[ChangeEvent.key]] semantics).
    */
  def eventsTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.varchar("event_type", 64),
      Col.double("value"), Col.varchar("props", 4096)))

  /** Encode the sf-dir `events` table into `nServers` binlog files under
    * a per-JVM scratch dir; returns the dir. Deterministic end-to-end:
    * hash partitioning on user_id fixes each row's file, the
    * within-partition sort fixes its position, and the writer's clock
    * comes from row timestamps — so reruns rewrite byte-identical logs.
    */
  def encodeEvents(spark: SparkSession, sfDir: String,
                   nServers: Int = 4): String = {
    val dir = CoreOps.scratchDir("mysql_binlog", sfDir)
    // clear stale logs (e.g. from an older nServers value): a leftover
    // file would replay ghost events into every downstream read
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("props"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 100L + pid)
        try {
          val td = eventsTableDef(23L)
          var began = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            val images = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) { w.setClock(micros / 1000000L); w.begin(); began = true }
              else w.setClock(micros / 1000000L)
              Array[AnyRef](
                java.lang.Long.valueOf(r.getLong(0)),
                java.lang.Long.valueOf(r.getLong(1)),
                java.lang.Long.valueOf(micros),
                r.getString(3),
                java.lang.Double.valueOf(r.getDouble(4)),
                r.getString(5))
            }.toSeq
            w.tableMap(td)
            w.writeRows(td, images)
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin() // empty partition: a valid header-only log
        } finally w.close()
        // atomic publish: a reader never sees a half-written log
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }
}
