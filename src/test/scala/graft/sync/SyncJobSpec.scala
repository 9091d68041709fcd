package graft.sync

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end snapshot sync on the sf0.001 fixture dir: row fidelity per
  * table, strategy selection, checkpoint file (SURVEY §3.1 lifecycle).
  */
class SyncJobSpec extends SparkSpec {

  test("full sync copies every table with exact row counts + checkpoint") {
    val dest = Files.createTempDirectory("graft_sync_spec_").toString
    val report = SyncJob.run(spark, sf, dest, SyncJob.harnessPk.get)
      .collect().map(r => r.getAs[String]("table") -> r.getAs[Long]("rows")).toMap

    assert(report.keySet == graft.model.Tables.all.toSet)
    graft.model.Tables.all.foreach { t =>
      val srcRows = spark.read.parquet(s"$sf/$t.parquet").count()
      val dstRows = spark.read.parquet(s"$dest/$t.parquet").count()
      assert(srcRows == dstRows, s"table $t: src=$srcRows dst=$dstRows")
      assert(report(t) == srcRows)
    }
    assert(new java.io.File(s"$dest/_sync_metadata.json").isFile)
    val meta = Files.readString(java.nio.file.Paths.get(s"$dest/_sync_metadata.json"))
    assert(meta.contains("\"lineitem\""))
    assert(meta.contains("\"max_pk\": 1499"))
  }

  test("content digest validates a copy and catches a tampered row") {
    import org.apache.spark.sql.functions._
    val dest = Files.createTempDirectory("graft_digest_spec_").toString
    SyncJob.run(spark, sf, dest, SyncJob.harnessPk.get).collect()
    def digest(dir: String) = {
      val df = spark.read.parquet(s"$dir/orders.parquet")
      Validate.contentDigest(df, df.columns.toSeq.map(col)).collect()(0)
    }
    val (src, dst) = (digest(sf), digest(dest))
    assert(src == dst, s"copy digest mismatch: $src vs $dst")
    // tamper ONE value in the copy → digest must move, count must not
    val tampered = Files.createTempDirectory("graft_digest_bad_").toString
    spark.read.parquet(s"$dest/orders.parquet")
      .withColumn("o_totalprice",
        when(col("o_orderkey") === 7, col("o_totalprice") + 0.01)
          .otherwise(col("o_totalprice")))
      .write.parquet(s"$tampered/orders.parquet")
    val bad = digest(tampered)
    assert(bad.getAs[Long]("n_rows") == src.getAs[Long]("n_rows"))
    assert(bad.getAs[String]("digest") != src.getAs[String]("digest"),
      "tampered table must produce a different digest")
  }

  test("include/exclude regex filters compose like the reference's") {
    val names = Seq("orders", "orders_archive", "lineitem", "tmp_orders")
    import scala.util.matching.Regex
    // exclude beats include (exclude applied first, sync.py:158-159)
    assert(SyncJob.filterTables(names, Some(new Regex("orders")),
      Some(new Regex("tmp|archive"))) == Seq("orders"))
    assert(SyncJob.filterTables(names, None, Some(new Regex("^tmp_"))) ==
      Seq("orders", "orders_archive", "lineitem"))
    assert(SyncJob.filterTables(names, Some(new Regex("^lineitem$")), None) ==
      Seq("lineitem"))
  }

  test("large table gets range-chunked into ~rows/batch partitions") {
    val dest = Files.createTempDirectory("graft_sync_chunks_").toString
    val rpt = SyncJob.syncTable(spark, sf, dest, "lineitem", Some("l_orderkey"),
      SyncJob.SyncConfig(batchSize = 1000L))
    assert(rpt.strategy == "RangeChunks")
    assert(rpt.partitions == 6) // 6000 rows / 1000
    assert(rpt.minId == 0L && rpt.maxId == 1499L)
  }

  test("chunked parquet copy plans scan->sink with no Exchange") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString): Unit
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val dest = Files.createTempDirectory("graft_sync_noshuffle_").toString
      SyncJob.syncTable(spark, sf, dest, "lineitem", Some("l_orderkey"),
        SyncJob.SyncConfig(batchSize = 1000L))
      // listener delivery is async — wait for the write's plan
      val deadline = System.nanoTime() + 30e9.toLong
      var copyPlan: Option[String] = None
      while (copyPlan.isEmpty && System.nanoTime() < deadline) {
        copyPlan = plans.toArray(Array.empty[String])
          .find(p => p.contains("WriteFiles") || p.contains("InsertInto"))
        if (copyPlan.isEmpty) Thread.sleep(100)
      }
      assert(copyPlan.isDefined, "no write plan captured")
      assert(!copyPlan.get.contains("Exchange"),
        s"copy must be shuffle-free, got:\n${copyPlan.get}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("catalog discovery rides the Hadoop FS: file:-scheme source dir") {
    // the source dir IS an object-store path in the deployment this
    // models (SHOW TABLES ≈ list the bucket prefix); a java.io listing
    // there would return empty — a silent no-tables sync. file:-scheme
    // is the local proxy: the Hadoop FS resolves it, java.io.File
    // cannot.
    val dir = Files.createTempDirectory("graft_disc_").toString
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir, "orders.parquet"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "lineitem.parquet")) // Spark-written dir form
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "_sync_metadata.json"))
    assert(SyncJob.discoverTables(s"file:$dir") == Seq("lineitem", "orders"))
    // absent dir: empty catalog, loudly NOT an exception — the caller
    // decides whether zero tables is an error
    assert(SyncJob.discoverTables(s"file:$dir/nope").isEmpty)
  }
}
