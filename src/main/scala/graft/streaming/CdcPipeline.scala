package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Snapshot-then-stream CDC application (St2 — the north star's
  * "Structured Streaming reading the binlog, writing to ClickHouse",
  * BASELINE.json). The binlog is fronted by a directory of change-event
  * files (the standard file-fed stand-in when no broker is reachable;
  * swapping in a Kafka/Debezium source changes ONE readStream line).
  *
  * Semantics follow ClickHouse ReplacingMergeTree, which is what the
  * reference targets: the applied table keeps, per key, the row with the
  * highest (ts, seq); a delete event is a tombstone that wins the same
  * race. Apply is idempotent and commutative across micro-batches, so
  * replays after failure converge — this is what makes the reference's
  * "snapshot hole" trade-off (SURVEY §3.4-2) safe here too.
  */
object CdcPipeline {

  val changeEventSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** File-fed CDC source: watches `dir` for JSON change-event files in
    * commit order. `maxFilesPerTrigger` bounds micro-batch size
    * (backpressure — the `maxOffsetsPerTrigger` analog).
    */
  def fileCdcSource(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(changeEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Latest-version-per-(table, key) over a change log: ReplacingMergeTree
    * collapse. Keyed on BOTH table and key — different tables may reuse
    * key values. Tombstones WIN and are KEPT (with their `op`): dropping
    * them here would let an older event from a later micro-batch
    * resurrect a deleted row, breaking commutativity. Read live rows
    * through [[currentState]].
    */
  def latestState(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("table"), col("key"))
      .orderBy(col("ts").desc, col("seq").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The live rows of an applied state table (tombstones filtered). */
  def currentState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverBuckets(stateDir)
    spark.read.parquet(stateDir).filter(col("op") =!= ChangeEvent.Delete)
      .drop("bucket")
  }

  /** Number of hash buckets a state table is partitioned into. Part of
    * the state dir's on-disk contract: every writer of one state dir
    * must use the same value.
    */
  val DefaultStateBuckets = 64

  /** Deterministic state bucket of a change row — the partition key that
    * makes the merge incremental.
    */
  private def withBucket(df: DataFrame, numBuckets: Int): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(col("table"), col("key")), lit(numBuckets)).cast("int"))

  /** Merge one micro-batch of changes into the parquet state table at
    * `stateDir`: the state is hash-partitioned into `numBuckets` buckets
    * on (table, key), and a micro-batch rewrites ONLY the buckets its
    * keys fall into — existing rows of untouched buckets are neither
    * read nor written, so apply cost is proportional to the batch's key
    * spread, not the state size. Within each touched bucket the union of
    * old rows and new changes re-collapses to highest-(ts, seq) per
    * (table, key); tombstones persist with their versions, so apply is
    * idempotent AND commutative across micro-batches — replaying or
    * reordering batches converges.
    *
    * Partition pruning serves the read side (only touched `bucket=`
    * directories are scanned); the write side stages the merged buckets
    * in a sibling directory and then swaps each touched bucket with a
    * rename pair, healed by [[recoverBuckets]] — a crash at ANY point
    * leaves every bucket's data on disk (staged, live, or `__old`), so
    * replaying the micro-batch from the streaming checkpoint converges
    * with no loss. At 100 TB the same layout maps onto a key-partitioned
    * MERGE into a format with row-level upsert (ClickHouse
    * ReplacingMergeTree itself, or an Iceberg/Delta table); the collapse
    * logic the engine owns is identical.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                 numBuckets: Int = DefaultStateBuckets): Unit = {
    recoverBuckets(stateDir)
    val cols = Seq("op", "table", "key", "ts", "seq", "payload")
    val bucketed = withBucket(batch.select(cols.map(col): _*), numBuckets)
    val touched = bucketed.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted                 // ≤ numBuckets values
    if (touched.isEmpty) return
    val existing: DataFrame =
      if (new java.io.File(stateDir).exists())
        spark.read.parquet(stateDir)
          .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      else bucketed.limit(0)
    val merged = latestState(
      existing.select((cols :+ "bucket").map(col): _*)
        .unionByName(bucketed.select((cols :+ "bucket").map(col): _*)))
      .select((cols :+ "bucket").map(col): _*)
    // stage the touched buckets fully, then swap each into place:
    // live -> __old, staged -> live, drop __old
    val staging = new java.io.File(stateDir + "_staging")
    deleteRec(staging)
    merged.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(staging.getPath)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    touched.foreach { b =>
      val live = new java.io.File(s"$stateDir/bucket=$b")
      val old = new java.io.File(s"$stateDir/bucket=${b}__old")
      val staged = new java.io.File(s"${staging.getPath}/bucket=$b")
      deleteRec(old)
      if (live.exists() && !live.renameTo(old))
        throw new java.io.IOException(s"cannot set aside $live")
      if (!staged.renameTo(live))
        throw new java.io.IOException(s"cannot publish $staged")
      deleteRec(old)
    }
    deleteRec(staging)
  }

  /** Heal an interrupted bucket swap: a `bucket=N__old` with no live
    * `bucket=N` means the crash hit between the two renames — restore
    * the old data; with a live dir present the swap completed — drop the
    * leftover. Idempotent; runs before every apply and read.
    */
  private def recoverBuckets(stateDir: String): Unit = {
    val dir = new java.io.File(stateDir)
    if (!dir.isDirectory) return
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.endsWith("__old"))
      .foreach { old =>
        val live = new java.io.File(dir, old.getName.stripSuffix("__old"))
        if (live.exists()) deleteRec(old)
        else if (!old.renameTo(live))
          throw new java.io.IOException(s"cannot restore $old")
      }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** Launch the continuous apply: change files → micro-batch upsert into
    * the parquet state table, offsets tracked in `checkpointDir` (the
    * Structured-Streaming form of the reference's metadata.txt).
    */
  def start(spark: SparkSession, changesDir: String, stateDir: String,
            checkpointDir: String): StreamingQuery =
    fileCdcSource(spark, changesDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, stateDir)
      }
      .start()

  /** Launch the continuous apply from the custom binlog-tail source
    * (graft.streaming.BinlogSource — a DataSourceV2 MicroBatchStream over
    * an append-only change log, offset = log position) instead of the
    * file-glob stand-in. Same downstream apply.
    */
  def startFromBinlog(spark: SparkSession, logPath: String, stateDir: String,
                      checkpointDir: String,
                      maxLinesPerTrigger: Long = 10000L): StreamingQuery =
    spark.readStream
      .format(classOf[BinlogSourceProvider].getName)
      .option("path", logPath)
      .option("maxLinesPerTrigger", maxLinesPerTrigger.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, stateDir)
      }
      .start()

  /** Apply one CDC micro-batch into a JDBC target — the "writing to
    * ClickHouse" leg of the north star, runnable against any JDBC
    * engine. The batch first collapses to its latest row per
    * (table, key) (same ReplacingMergeTree ordering as the parquet
    * state), then each partition upserts its keys in one transaction:
    * DELETE the key, INSERT the surviving row unless it is a
    * tombstone. Each key appears exactly once after the collapse, so
    * partitions never contend on a key, and a replayed micro-batch
    * re-deletes and re-inserts identical rows — idempotent, the same
    * convergence contract as [[applyBatch]]. Against ClickHouse
    * ReplacingMergeTree the DELETE leg is unnecessary (versioned
    * INSERTs collapse at merge time); the transactional form is the
    * general-RDBMS discipline and is what the Derby test pins.
    * Target DDL: (tbl VARCHAR, k BIGINT, ts TIMESTAMP, seq BIGINT,
    * payload VARCHAR) with (tbl, k) unique — names chosen to dodge
    * reserved words; the engine never issues DDL (reference stance).
    */
  def applyBatchJdbc(batch: DataFrame, url: String, table: String,
                     props: java.util.Properties = new java.util.Properties(),
                     batchSize: Int = 1000): Unit = {
    val latest = latestState(batch)
      .select(col("op"), col("table"), col("key"), col("ts"), col("seq"),
        col("payload"))
    latest.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(
            s"DELETE FROM $table WHERE tbl = ? AND k = ?")
          val ins = conn.prepareStatement(
            s"INSERT INTO $table (tbl, k, ts, seq, payload) VALUES (?, ?, ?, ?, ?)")
          try {
            var n = 0
            rows.foreach { r =>
              del.setString(1, r.getString(1))
              del.setLong(2, r.getLong(2))
              del.addBatch()
              if (r.getString(0) != ChangeEvent.Delete) {
                ins.setString(1, r.getString(1))
                ins.setLong(2, r.getLong(2))
                ins.setTimestamp(3, r.getTimestamp(3))
                ins.setLong(4, r.getLong(4))
                ins.setString(5, r.getString(5))
                ins.addBatch()
              }
              n += 1
              // flush deletes BEFORE inserts so a key's delete always
              // precedes its re-insert within the flush group
              if (n % batchSize == 0) { del.executeBatch(); ins.executeBatch() }
            }
            del.executeBatch(); ins.executeBatch()
            conn.commit()
          } catch { case e: Throwable =>
            // roll back EXPLICITLY: close() with an open transaction is
            // driver-defined (some engines commit on close), and a
            // half-applied micro-batch must never become visible
            try conn.rollback() catch { case _: Throwable => }
            throw e
          } finally { del.close(); ins.close() }
        } finally conn.close()
      }
    }
  }

  /** [[startFromBinlog]] with a JDBC target instead of the parquet
    * state table: binlog tail → per-micro-batch transactional upsert.
    */
  def startFromBinlogJdbc(spark: SparkSession, logPath: String,
                          url: String, table: String,
                          props: java.util.Properties,
                          checkpointDir: String,
                          maxLinesPerTrigger: Long = 10000L): StreamingQuery =
    spark.readStream
      .format(classOf[BinlogSourceProvider].getName)
      .option("path", logPath)
      .option("maxLinesPerTrigger", maxLinesPerTrigger.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatchJdbc(batch, url, table, props)
      }
      .start()

  /** [[startFromBinlogJdbc]] over the REAL MySQL wire format
    * ([[MysqlBinlogSourceProvider]]) instead of the TSV stand-in, with
    * the snapshot-fence start the reference's metadata.txt exists for:
    * a fresh stream begins at `startPos` (the recorded SHOW-MASTER-
    * STATUS position — history before it is already in the snapshot) or
    * at the first transaction past `startGtid` (the recorded
    * Executed_Gtid_Set — metadata.txt's third line; GTID auto-position,
    * valid even across a failover that renumbers log files),
    * a checkpointed one resumes from its committed (file, byte) offset.
    * The `src` column rides along untouched; the apply collapses on
    * (table, key) as everywhere.
    */
  def startFromMysqlBinlogJdbc(spark: SparkSession, logPath: String,
                               url: String, table: String,
                               props: java.util.Properties,
                               checkpointDir: String,
                               startPos: Option[Long] = None,
                               maxEventsPerTrigger: Long = 10000L,
                               startGtid: Option[String] = None): StreamingQuery = {
    var r = spark.readStream
      .format(classOf[MysqlBinlogSourceProvider].getName)
      .option("path", logPath)
      .option("maxEventsPerTrigger", maxEventsPerTrigger.toString)
    startPos.foreach(p => r = r.option("startPos", p.toString))
    startGtid.foreach(g => r = r.option("startGtid", g))
    r.load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatchJdbc(batch.drop("src"), url, table, props)
      }
      .start()
  }

  /** Snapshot-then-stream: batch-copy the current table state (the
    * reference's whole program), then apply the change stream from the
    * recorded offset forward. Returns the running query.
    * `useBinlog=true` tails a single change-log file via the custom
    * [[BinlogSourceProvider]] instead of a JSON file directory.
    */
  def snapshotThenStream(spark: SparkSession, snapshot: DataFrame,
                         keyCol: String, tsCol: String,
                         changesDir: String, stateDir: String,
                         checkpointDir: String,
                         useBinlog: Boolean = false): StreamingQuery = {
    val asState = snapshot.select(
      lit(ChangeEvent.Insert).as("op"),
      lit("snapshot").as("table"),
      col(keyCol).cast("long").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      lit(0L).as("seq"),
      to_json(struct(snapshot.columns.map(col): _*)).as("payload"))
    // same bucketed layout the streaming apply maintains
    withBucket(asState, DefaultStateBuckets).write
      .mode(SaveMode.Overwrite).partitionBy("bucket").parquet(stateDir)
    if (useBinlog) startFromBinlog(spark, changesDir, stateDir, checkpointDir)
    else start(spark, changesDir, stateDir, checkpointDir)
  }

  /** Stateful applier for `binlog_row_image=MINIMAL` ×
    * `binlog_row_value_options=PARTIAL_JSON` — the wire-minimal server
    * config real deployments run (docs/SCALE.md): the log carries
    * neither the before document nor the full after document, only a
    * diff vector, which the decoder surfaces as a deferred
    * `{"__jsondiff":"<base64>"}` marker. Reconstructing the document
    * therefore REQUIRES keyed state: this replays each (src, key)'s
    * history in seq order, folding full documents (INSERTs, full
    * updates) as state replacements and deferred markers through the
    * exact wire-path diff apply ([[graft.functions.Kernels.applyJsonDiffB64]],
    * one codegen'd call per event). Returns the latest reconstructed
    * document per key.
    *
    * Scale shape: one shuffle on (src, key); per-key state is the
    * key's event history within the replay window — in the streaming
    * form (foreachBatch over this) each micro-batch folds only ITS
    * events against the stored latest document, so steady-state cost
    * is O(batch), exactly the [[latestState]] bucketed-apply stance. A
    * deferred marker with no prior full document refuses loudly: the
    * consumer joined mid-log without a snapshot, and fabricating a
    * document would be silently wrong.
    */
  def applyDeferredJsonDiffs(changes: DataFrame, jsonField: String,
                             outCol: String = null): DataFrame = {
    val out = if (outCol == null) jsonField else outCol
    foldedDocs(changes, jsonField)
      .select(col("src"), col("key"),
        docFold(col("evs"), lit(null).cast("string")).as(out))
  }

  /** One (src, key)'s in-order (seq, doc) event array per row. */
  private def foldedDocs(changes: DataFrame, jsonField: String): DataFrame =
    changes
      .select(col("src"), col("key"), col("seq"),
        get_json_object(col("payload"), s"$$.$jsonField").as("doc"))
      // updates that did not touch the field carry no marker and no
      // document — they leave the state unchanged, skip them
      .filter(col("doc").isNotNull)
      .groupBy("src", "key")
      .agg(sort_array(collect_list(struct(col("seq"), col("doc"))))
        .as("evs"))

  /** The document fold shared by the batch and streaming forms: full
    * documents replace the accumulator, deferred markers patch it
    * through the exact wire apply; a marker over nothing refuses.
    */
  private def docFold(evs: org.apache.spark.sql.Column,
                      init: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(evs, init, (acc, e) => {
      val d = e.getField("doc")
      val marker = get_json_object(d, "$.__jsondiff")
      when(marker.isNull, d) // full document: replace state
        .when(acc.isNull, raise_error(concat(
          lit("deferred JSON diff for key with no prior full " +
            "document (mid-log consumer without a snapshot), key="),
          col("key").cast("string"))))
        .when(length(marker) === 0, acc) // empty vector: unchanged
        .otherwise(
          graft.functions.Kernels.applyJsonDiffB64Col(acc, marker))
    })

  private def docRounds(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("docs_"))
      .flatMap(_.getPath.getName.stripPrefix("docs_").toLongOption)
      .sorted
  }

  /** Streaming form of [[applyDeferredJsonDiffs]]: each micro-batch
    * folds ONLY ITS events against the stored latest documents —
    * steady-state cost O(batch fold) + O(keys) state write per round.
    * State is batch-id-versioned (`docs_<id>`, the JoinIvm stance), so
    * an at-least-once redelivery rebuilds exactly its own round from
    * the kept pre-state; discovery rides the Hadoop FS API (a cluster
    * stateDir must not silently read as empty).
    */
  def applyDeferredJsonBatch(batch: DataFrame, jsonField: String,
                             stateDir: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val rounds = docRounds(spark, stateDir)
    val prev = rounds.filter(_ < id).lastOption
    val pre = prev.map(r => spark.read.parquet(s"$stateDir/docs_$r"))
      .getOrElse(batch.select(col("src"), col("key"),
        lit(null).cast("string").as("doc")).limit(0))
    val folded = foldedDocs(batch, jsonField)
    folded.join(pre.withColumnRenamed("doc", "doc0"),
        Seq("src", "key"), "full_outer")
      .select(col("src"), col("key"),
        when(col("evs").isNull, col("doc0")) // untouched key: carry over
          .otherwise(docFold(col("evs"), col("doc0"))).as("doc"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$stateDir/docs_$id")
    // keep `prev` whole for a redelivery of THIS batch; drop older
    rounds.filter(r => prev.exists(r < _)).foreach { r =>
      val path = new org.apache.hadoop.fs.Path(s"$stateDir/docs_$r")
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true): Unit
    }
  }

  def startDeferredJsonApply(changes: DataFrame, jsonField: String,
                             stateDir: String, checkpointDir: String)
      : StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyDeferredJsonBatch(batch, jsonField, stateDir, id)
      }
      .start()

  /** The reconstructed latest documents at the current stream position. */
  def deferredJsonState(spark: SparkSession, stateDir: String): DataFrame = {
    val rounds = docRounds(spark, stateDir)
    require(rounds.nonEmpty, s"no document state under $stateDir")
    spark.read.parquet(s"$stateDir/docs_${rounds.last}")
  }
}
