package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: two tables bucketed on their join key
  * with equal bucket counts join WITHOUT any Exchange — the co-located
  * fact⨝fact strategy at 100 TB where neither side broadcasts
  * (SURVEY §1.4 / build-prompt partitioning mandate).
  */
class BucketingSpec extends SparkSpec {

  test("equal-bucketed tables sort-merge join with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sf).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the JOIN inputs must come straight from bucketed scans — no
      // shuffle on either join key (the later groupBy on c_mktsegment
      // legitimately shuffles on ITS key)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")

      // and it still returns the right answer
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
