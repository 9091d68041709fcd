package graft.sync

import org.apache.spark.sql.SparkSession

import java.util.Properties
import scala.util.matching.Regex

/** The reference's user surface — its argparse CLI
  * (mysql_to_clickhouse_sync.py:224-240; README.md:3-47 is the verbatim
  * `--help`) — parsed into the engine's `SyncConfig` + endpoints and run
  * as one [[JdbcSyncJob]]. Flag names, required/optional split, and
  * defaults (`--batch_size 1000`, `--max_workers 10`, empty
  * include/exclude regexes) match the reference exactly; `--src_url` /
  * `--dst_url` additionally accept ANY JDBC pair, since the engine is
  * not MySQL/ClickHouse-specific (tests drive it against embedded
  * Derby).
  *
  * Verbs (first non-flag argument; the reference has only the implicit
  * first one):
  *   - `sync` (default): one snapshot copy, the reference's program.
  *   - `snapshot-then-stream`: the full lifecycle the reference only
  *     PREPARES for — fenced snapshot copy + `metadata.txt` binlog
  *     coordinates, then the CDC stream from `--binlog` applied to the
  *     destination as transactional per-micro-batch upserts
  *     ([[graft.streaming.CdcPipeline.startFromBinlogJdbc]]), running
  *     until terminated. Requires `--binlog`; `--cdc_table` names the
  *     destination change-state table (default `cdc_state`).
  */
object SyncCli {

  final case class CliConfig(
      verb: String,
      srcUrl: String,
      dstUrl: String,
      srcProps: Properties,
      dstProps: Properties,
      checkpointDir: String,
      sync: SyncJob.SyncConfig,
      binlog: Option[String],
      cdcTable: String)

  private val mysqlKeys = Seq("mysql_host", "mysql_port", "mysql_user",
    "mysql_password", "mysql_db")
  private val chKeys = Seq("clickhouse_host", "clickhouse_port",
    "clickhouse_user", "clickhouse_password", "clickhouse_database")

  /** argv → config. `--flag value` pairs only (the reference's argparse
    * shape); unknown flags and dangling values are errors, not warnings.
    */
  val Verbs = Set("sync", "snapshot-then-stream")

  def parse(rawArgs: Array[String]): Either[String, CliConfig] = {
    val (verb, args) = rawArgs.headOption match {
      case Some(v) if !v.startsWith("--") =>
        if (!Verbs(v)) return Left(
          s"unknown verb '$v' (expected ${Verbs.mkString(" | ")})")
        (v, rawArgs.drop(1))
      case _ => ("sync", rawArgs)
    }
    val known = (mysqlKeys ++ chKeys ++ Seq("batch_size", "max_workers",
      "include_tables", "exclude_tables", "src_url", "dst_url",
      "checkpoint_dir", "binlog", "cdc_table")).toSet
    val kv = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (!a.startsWith("--")) return Left(s"expected --flag, got '$a'")
      val key = a.drop(2)
      if (!known(key)) return Left(s"unknown flag --$key")
      if (i + 1 >= args.length) return Left(s"--$key requires a value")
      kv(key) = args(i + 1)
      i += 2
    }
    def regexOf(key: String): Either[String, Option[Regex]] =
      kv.get(key).filter(_.nonEmpty) match {
        case None => Right(None)
        case Some(p) =>
          try Right(Some(new Regex(p)))
          catch { case e: Exception => Left(s"--$key bad regex: ${e.getMessage}") }
      }
    def longOf(key: String, dflt: Long): Either[String, Long] =
      kv.get(key) match {
        case None => Right(dflt)
        case Some(v) => v.toLongOption.filter(_ > 0)
          .toRight(s"--$key must be a positive integer, got '$v'")
      }

    val srcGiven = kv.contains("src_url")
    val dstGiven = kv.contains("dst_url")
    val missingSrc = if (srcGiven) Nil else mysqlKeys.filterNot(kv.contains)
    val missingDst = if (dstGiven) Nil else chKeys.filterNot(kv.contains)
    if (missingSrc.nonEmpty || missingDst.nonEmpty)
      return Left("missing required: " +
        (missingSrc ++ missingDst).map("--" + _).mkString(" "))

    val srcProps = new Properties()
    val dstProps = new Properties()
    val srcUrl = if (srcGiven) kv("src_url") else {
      srcProps.setProperty("user", kv("mysql_user"))
      srcProps.setProperty("password", kv("mysql_password"))
      s"jdbc:mysql://${kv("mysql_host")}:${kv("mysql_port")}/${kv("mysql_db")}"
    }
    val dstUrl = if (dstGiven) kv("dst_url") else {
      dstProps.setProperty("user", kv("clickhouse_user"))
      dstProps.setProperty("password", kv("clickhouse_password"))
      s"jdbc:clickhouse://${kv("clickhouse_host")}:${kv("clickhouse_port")}/${kv("clickhouse_database")}"
    }
    if (verb == "snapshot-then-stream" && !kv.contains("binlog"))
      return Left("snapshot-then-stream requires --binlog PATH")
    for {
      batch <- longOf("batch_size", 1000L)
      workers <- longOf("max_workers", 10L)
      include <- regexOf("include_tables")
      exclude <- regexOf("exclude_tables")
    } yield CliConfig(verb, srcUrl, dstUrl, srcProps, dstProps,
      kv.getOrElse("checkpoint_dir", "."),
      SyncJob.SyncConfig(
        includeTables = include,
        excludeTables = exclude,
        batchSize = batch,
        maxWorkers = workers.toInt),
      kv.get("binlog"),
      kv.getOrElse("cdc_table", "cdc_state"))
  }

  /** Run one full sync from a parsed config (separate from `main` so
    * tests can drive the whole CLI path against live Derby endpoints).
    */
  def runWith(spark: SparkSession, c: CliConfig): Unit = {
    JdbcSyncJob.run(spark,
      JdbcSyncJob.Endpoint(c.srcUrl, c.srcProps),
      JdbcSyncJob.Endpoint(c.dstUrl, c.dstProps),
      c.checkpointDir, c.sync, None, JdbcSyncJob.SnapshotFence())
      .show(1000, truncate = false)
  }

  /** The `snapshot-then-stream` verb: the reference's snapshot (fence →
    * bounds → metadata.txt coordinates → copy) followed by the CDC
    * stream it only prepares for — the change log at `c.binlog` applied
    * to the destination as transactional per-micro-batch upserts into
    * `c.cdcTable`. Returns the running query (the caller decides
    * between awaitTermination — `main` — and processAllAvailable/stop —
    * tests). The stream checkpoint lives UNDER the sync checkpoint dir,
    * beside metadata.txt: one directory carries the whole lifecycle's
    * resume state.
    */
  def runSnapshotThenStream(spark: SparkSession,
                            c: CliConfig): org.apache.spark.sql.streaming.StreamingQuery = {
    runWith(spark, c)
    graft.streaming.CdcPipeline.startFromBinlogJdbc(spark, c.binlog.get,
      c.dstUrl, c.cdcTable, c.dstProps,
      checkpointDir = s"${c.checkpointDir}/cdc_checkpoint")
  }

  def main(args: Array[String]): Unit = parse(args) match {
    case Left(err) =>
      System.err.println(s"error: $err")
      System.err.println("usage: SyncCli [sync|snapshot-then-stream] " +
        "--mysql_host H --mysql_port P " +
        "--mysql_user U --mysql_password PW --mysql_db DB " +
        "--clickhouse_host H --clickhouse_port P --clickhouse_user U " +
        "--clickhouse_password PW --clickhouse_database DB " +
        "[--batch_size 1000] [--max_workers 10] " +
        "[--include_tables RE] [--exclude_tables RE] " +
        "[--src_url JDBC] [--dst_url JDBC] [--checkpoint_dir DIR] " +
        "[--binlog PATH] [--cdc_table cdc_state]")
      sys.exit(2)
    case Right(cfg) =>
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-sync")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      try {
        if (cfg.verb == "snapshot-then-stream")
          runSnapshotThenStream(spark, cfg).awaitTermination()
        else runWith(spark, cfg)
      } finally spark.stop()
  }
}
