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

  test("morton2 interleave round-trips and orders like the curve") {
    import graft.functions.Kernels
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong().abs & 0x1FFFFFL
      val b = rnd.nextLong().abs & 0x1FFFFFL
      val packed = Kernels.morton2Inverse(Kernels.morton2(a, b))
      assert((packed & 0x1FFFFFL) == a && (packed >>> 21) == b,
        s"round-trip failed for ($a, $b)")
    }
    // interleaving property: bumping either coordinate past the other's
    // contribution moves z monotonically within a fixed quadrant
    assert(Kernels.morton2(0, 0) == 0L)
    assert(Kernels.morton2(1, 0) == 1L)
    assert(Kernels.morton2(0, 1) == 2L)
    assert(Kernels.morton2(1, 1) == 3L)
    assert(Kernels.morton2(2, 2) == 12L)
  }

  test("z-ordered layout clusters both dimensions into tight per-file boxes") {
    try {
      Bucketing.writeZOrdered(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "z_lineitem_spec", "l_partkey", "l_suppkey", files = 8)

      // result identity under layout
      val got = spark.table("z_lineitem_spec")
        .filter(col("l_partkey").between(40, 90) &&
          col("l_suppkey").between(2, 5))
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = Tables.lineitem(spark, sf)
        .filter(col("l_partkey").between(40, 90) &&
          col("l_suppkey").between(2, 5))
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected && got.nonEmpty)

      // the layout's point: per-FILE min/max boxes are tight in BOTH
      // dimensions, so footer stats can prune two-column predicates.
      // Sum of per-file partkey ranges ≪ files × full range (an
      // unsorted or suppkey-sorted layout gives ~full range per file).
      val byFile = spark.table("z_lineitem_spec")
        .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
        .groupBy("f")
        .agg((max("l_partkey") - min("l_partkey")).as("pk_range"),
          (max("l_suppkey") - min("l_suppkey")).as("sk_range"))
        .collect()
      assert(byFile.length > 1, "expected a multi-file layout")
      val full = Tables.lineitem(spark, sf)
        .agg((max("l_partkey") - min("l_partkey")).cast("double"),
          (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
      val meanPk = byFile.map(_.getLong(1)).sum.toDouble / byFile.length
      val meanSk = byFile.map(_.getLong(2)).sum.toDouble / byFile.length
      assert(meanPk < full.getDouble(0) * 0.6,
        s"z-layout should shrink per-file partkey boxes: mean $meanPk " +
          s"of full ${full.getDouble(0)}")
      // BOTH dimensions must cluster — a morton2 regression that sorts
      // on one key alone keeps the partkey assertion green while the
      // other dimension scatters to ~full range per file
      assert(meanSk < full.getDouble(1) * 0.75,
        s"z-layout should shrink per-file suppkey boxes too: mean $meanSk " +
          s"of full ${full.getDouble(1)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS z_lineitem_spec")
    }
  }

  test("compact merges small files and preserves content exactly") {
    import graft.sync.Validate
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_")
      .resolve("t").toString
    // simulate an accreted ingest: 24 tiny files
    Tables.orders(spark, sf).repartition(24)
      .write.mode("overwrite").parquet(dir)
    val origCols = spark.read.parquet(dir).columns.toSeq
    val before = Validate.contentDigest(spark.read.parquet(dir),
      origCols.map(col)).head()
    val (nBefore, nAfter) = Bucketing.compact(spark, dir, 64L * 1024 * 1024)
    assert(nBefore == 24, s"expected 24 input files, saw $nBefore")
    assert(nAfter < nBefore,
      s"compaction must reduce file count: $nBefore -> $nAfter")
    val after = Validate.contentDigest(spark.read.parquet(dir),
      origCols.map(col)).head()
    assert(before == after,
      s"compaction changed content: $before vs $after")
    // already-compact dirs are a no-op (no rewrite churn)
    val (b2, a2) = Bucketing.compact(spark, dir, 64L * 1024 * 1024)
    assert(b2 == a2 && b2 == nAfter, s"expected no-op, saw $b2 -> $a2")
    // heal a simulated mid-swap crash: the target renamed away but the
    // second rename never happened — data lives only at __old
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(dir + "__old")))
    val (b3, a3) = Bucketing.compact(spark, dir, 64L * 1024 * 1024)
    assert(b3 == a3 && b3 == nAfter, s"recovery should restore then no-op")
    val healed = Validate.contentDigest(spark.read.parquet(dir),
      origCols.map(col)).head()
    assert(healed == before, "healed dir must hold the original content")
  }
}
