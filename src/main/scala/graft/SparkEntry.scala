package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` runs the flagship snapshot-sync pipeline (the reference's whole
  * program, mysql_to_clickhouse_sync.py:123-222, restated as Spark jobs —
  * graft.sync.SyncJob) on sf0.001 and returns the per-table copy report.
  * `queries`/`oracleSql` expose the full operator inventory of SURVEY §2
  * (graft.Queries core + graft.ExtQueries [EXT] surface).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dest = java.nio.file.Files
      .createTempDirectory("graft_sync_").toString
    graft.sync.SyncJob.run(spark, "/root/testdata/sf0.001", dest,
      graft.sync.SyncJob.harnessPk.get)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
