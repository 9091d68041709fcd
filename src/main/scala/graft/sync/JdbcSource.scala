package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC scan-side of the sync (S1, SURVEY §2.1): Spark's built-in
  * range-partitioned JDBC read IS the reference's chunked scan —
  * `columnName/lowerBound/upperBound/numPartitions` generate exactly the
  * half-open `pk >= lo AND pk < hi` predicates per partition that
  * `mysql_to_clickhouse_sync_pagination.py:44` issues per chunk, with
  * one DB connection per partition task instead of one per chunk
  * (sync.py:41). Filters and projections push down to the database.
  */
object JdbcSource {

  /** Range-partitioned table read — the reference's whole scan strategy
    * as one call. `numPartitions` plays the role of the chunk count
    * (ChunkPlanner.numPartitions supplies it from bounds + batch size).
    */
  def rangePartitionedRead(spark: SparkSession, url: String, table: String,
                           pkCol: String, lowerBound: Long, upperBound: Long,
                           numPartitions: Int,
                           props: java.util.Properties = new java.util.Properties())
      : DataFrame =
    spark.read.jdbc(url, table, pkCol, lowerBound, upperBound, numPartitions, props)

  /** Single-partition read (the small-table strategy, sync.py:102-106). */
  def read(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
}
