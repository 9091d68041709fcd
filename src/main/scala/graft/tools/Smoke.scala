package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke-runner: drives the driver-facing surface exactly as the
  * harness does — `SparkEntry.entry` on sf0.001 plus every registered
  * query — and prints row counts. Usage:
  *   sbt "runMain graft.tools.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val report = graft.SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${report.count()}")
    report.show(20, truncate = false)

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      println(s"[smoke] $name rows=$n")
    }

    // Drive the CDC pipeline end-to-end over the custom binlog-tail
    // source: snapshot state → appended change-log lines → checkpointed
    // micro-batch upserts → final state.
    import graft.streaming.{BinlogSource, CdcPipeline, ChangeEvent}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_smoke_cdc_").toString
    val log = s"$base/changes.binlog"
    val snapshot = graft.model.Tables.customer(spark, sfDir)
      .limit(10).withColumn("updated_at",
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val q = CdcPipeline.snapshotThenStream(spark, snapshot, "c_custkey",
      "updated_at", changesDir = log, stateDir = s"$base/state",
      checkpointDir = s"$base/ckpt", useBinlog = true)
    q.processAllAvailable()
    BinlogSource.append(log, Seq(
      ChangeEvent("update", "snapshot", 1L,
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1L, """{"seg":"X"}"""),
      ChangeEvent("delete", "snapshot", 2L,
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2L, null)))
    q.processAllAvailable()
    q.stop()
    val state = CdcPipeline.currentState(spark, s"$base/state")
    println(s"[smoke] cdc_state rows=${state.count()} " +
      s"updated=${state.filter($"key" === 1L && $"payload".contains("X")).count()}")

    // Drive the full DB→DB sync against live embedded Derby databases
    // (the reference's actual job: discover → filter → chunk → copy →
    // checkpoint).
    import graft.sync.{JdbcSource, JdbcSyncJob, SyncJob}
    val dbBase = java.nio.file.Files.createTempDirectory("graft_smoke_db_").toString
    val srcUrl = s"jdbc:derby:$dbBase/src;create=true"
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(srcUrl)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE items (rowid BIGINT NOT NULL PRIMARY KEY, v VARCHAR(32))")
      val ins = conn.prepareStatement("INSERT INTO items VALUES (?, ?)")
      (0 until 2500).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"item_$i"); ins.addBatch()
      }
      ins.executeBatch(); st.close(); ins.close()
    } finally conn.close()
    val jdbcReport = JdbcSyncJob.run(spark,
      JdbcSyncJob.Endpoint(srcUrl, p),
      JdbcSyncJob.Endpoint(s"jdbc:derby:$dbBase/dst;create=true", p),
      pkFor = _ => Some("rowid"),
      checkpointDir = s"$dbBase/ckpt",
      cfg = SyncJob.SyncConfig(batchSize = 500L))
    jdbcReport.show(5, truncate = false)
    val copied = JdbcSource.read(spark,
      s"jdbc:derby:$dbBase/dst", "ITEMS", p).count()
    println(s"[smoke] jdbc_sync copied=$copied")

    // Drive the reference's CLI surface end-to-end (argv → parse →
    // introspected PKs → full sync), then the incremental resume path.
    import graft.sync.SyncCli
    val cliDst = s"jdbc:derby:$dbBase/cli_dst;create=true"
    val cliCkpt = s"$dbBase/cli_ckpt"
    SyncCli.parse(Array(
      "--src_url", srcUrl, "--dst_url", cliDst,
      "--batch_size", "500", "--checkpoint_dir", cliCkpt)) match {
      case Right(cfg) =>
        cfg.srcProps.putAll(p); cfg.dstProps.putAll(p)
        SyncCli.runWith(spark, cfg)
        val n = JdbcSource.read(spark, s"jdbc:derby:$dbBase/cli_dst", "ITEMS", p)
          .count()
        val resumed = JdbcSyncJob.resume(spark,
          JdbcSyncJob.Endpoint(srcUrl, p),
          JdbcSyncJob.Endpoint(cliDst, p),
          _ => Some("rowid"), cliCkpt).count()
        println(s"[smoke] cli_sync copied=$n resume_tables=$resumed")
      case Left(err) => println(s"[smoke] cli_sync PARSE FAILED: $err")
    }
    spark.stop()
  }
}
