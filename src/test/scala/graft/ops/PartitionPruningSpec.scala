package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Partition layout + pruning: a date-partitioned event table must scan
  * ONLY the selected day's directory (the 100 TB ingest layout — at a
  * petabyte of events, pruning is the difference between reading one day
  * and reading everything).
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write prunes to the selected partition") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_part_").toString + "/events_by_day"
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(base)

    val day = spark.read.parquet(base).select(min(col("day"))).head().getDate(0)
    val q = spark.read.parquet(base).filter(col("day") === lit(day))
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected a partition filter in:\n$plan")
    // correctness: pruned read equals the filtered full read
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit(day)).count()
    assert(q.count() == expected)
    assert(expected > 0)
  }
}
