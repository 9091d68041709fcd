package graft.tools

import java.nio.charset.StandardCharsets

import graft.streaming.{MysqlBinlog, MysqlBinlogWriter}
import MysqlBinlogWriter.{Col, TableDef, Writer}

/** CDC decode throughput stress (dev tool, the docs/SCALE.md "CDC
  * throughput" rows): synthesize binlogs of growing volume with the
  * fixture Writer — the events-table column mix (ints, µs timestamp,
  * varchar, double, binary JSON) in 64-row transactions — then time
  * the full consumer path (wire parse incl. CRC verify + row-image
  * decode + [[MysqlBinlog.changeEvents]] projection), plain and inside
  * zstd TRANSACTION_PAYLOAD wrappers.
  *
  * Pure JVM (no SparkSession): the binlog scan parallelizes per server
  * log, so single-thread decode MB/s × number of logs IS the cluster
  * ingest ceiling — the number that matters is per-core.
  *
  * Prints one JSON line per (scale, compression) cell:
  * `{"rows":N,"bytes":B,"compressed":bool,"sec":t,"events_per_sec":…,
  * "mb_per_sec":…}` — min of 3 runs, same estimator as Bench.
  */
object CdcBench {

  private def tableDef = TableDef(23L, "graft", "events", Seq(
    Col.bigint("user_id"), Col.bigint("event_id"),
    Col.timestamp6("ts"), Col.varchar("event_type", 64),
    Col.double("value"), Col.json("props")))

  private def writeLog(path: String, nTxn: Int, compressed: Boolean): Long = {
    val rng = new scala.util.Random(77)
    val td = tableDef
    val types = Array("click", "view", "purchase", "signup", "error")
    val w = new Writer(path, serverId = 9L)
    w.setClock(1700000000L)
    w.begin()
    w.previousGtids(Seq.empty)
    var eid = 0L
    (0 until nTxn).foreach { txn =>
      val rows = (0 until 64).map { _ =>
        eid += 1
        Array[AnyRef](
          java.lang.Long.valueOf(rng.nextInt(100000).toLong),
          java.lang.Long.valueOf(eid),
          java.lang.Long.valueOf(1700000000000000L + eid * 1000L),
          types(rng.nextInt(types.length)),
          java.lang.Double.valueOf(rng.nextDouble() * 100),
          s"""{"k": ${rng.nextInt(100)}, "tags": ["a", "b"]}""")
      }
      w.gtid("00000000-0000-4000-8000-000000000009", txn + 1L)
      if (compressed) {
        w.transactionPayload() { inner =>
          inner.query("graft", "BEGIN")
          inner.tableMap(td)
          inner.writeRows(td, rows)
          inner.xid(txn + 1L)
        }
      } else {
        w.query("graft", "BEGIN")
        w.tableMap(td)
        w.writeRows(td, rows)
        w.xid(txn + 1L)
      }
    }
    w.close()
    new java.io.File(path).length()
  }

  /** PARTIAL_JSON variant: every transaction is 64 partial updates
    * patching a ~1 KB JSON document (REPLACE a counter + INSERT an
    * array cell) — the wire-mode whose decode cost is the diff apply,
    * and whose win is the log-size column (a few-byte patch vs
    * re-logging the document).
    */
  private def writePartialLog(path: String, nTxn: Int): Long = {
    import graft.streaming.{MysqlJsonBinary, MysqlJsonDiff}
    import MysqlJsonDiff.{Diff, Diffs, OpInsert, OpReplace}
    val rng = new scala.util.Random(78)
    val td = tableDef
    val types = Array("click", "view", "purchase", "signup", "error")
    // a realistic ~1 KB document: the before image each patch applies to
    def doc(n: Int, tags: Int): String =
      s"""{"n":$n,"pad":"${"x" * 900}","tags":[${
        (0 until tags).map(i => s""""t$i"""").mkString(",")}]}"""
    val w = new Writer(path, serverId = 9L)
    w.setClock(1700000000L)
    w.begin()
    w.previousGtids(Seq.empty)
    var eid = 0L
    (0 until nTxn).foreach { txn =>
      val pairs = (0 until 64).map { _ =>
        eid += 1
        val i = (eid % 7).toInt
        val before = Array[AnyRef](
          java.lang.Long.valueOf(rng.nextInt(100000).toLong),
          java.lang.Long.valueOf(eid),
          java.lang.Long.valueOf(1700000000000000L + eid * 1000L),
          types(rng.nextInt(types.length)),
          java.lang.Double.valueOf(rng.nextDouble() * 100),
          doc(i, i))
        val after = before.clone()
        after(5) = Diffs(Seq(
          Diff(OpReplace, "$.n", Some(MysqlJsonBinary.JInt(i + 1L))),
          Diff(OpInsert, s"$$.tags[$i]",
            Some(MysqlJsonBinary.JStr(s"t$i")))))
        (before, after)
      }
      w.gtid("00000000-0000-4000-8000-000000000009", txn + 1L)
      w.query("graft", "BEGIN")
      w.tableMap(td)
      w.partialUpdateRows(td, pairs)
      w.xid(txn + 1L)
    }
    w.close()
    new java.io.File(path).length()
  }

  /** The apples-to-apples control for [[writePartialLog]]: the SAME
    * ~1 KB documents updated with FULL after images (what a server
    * without PARTIAL_JSON logs). The partial/full wire-size and
    * decode-rate ratio is the feature's cost-benefit.
    */
  private def writeFullUpdateLog(path: String, nTxn: Int): Long = {
    val rng = new scala.util.Random(78)
    val td = tableDef
    val types = Array("click", "view", "purchase", "signup", "error")
    def doc(n: Int, tags: Int): String =
      s"""{"n":$n,"pad":"${"x" * 900}","tags":[${
        (0 until tags).map(i => s""""t$i"""").mkString(",")}]}"""
    val w = new Writer(path, serverId = 9L)
    w.setClock(1700000000L)
    w.begin()
    w.previousGtids(Seq.empty)
    var eid = 0L
    (0 until nTxn).foreach { txn =>
      val pairs = (0 until 64).map { _ =>
        eid += 1
        val i = (eid % 7).toInt
        val before = Array[AnyRef](
          java.lang.Long.valueOf(rng.nextInt(100000).toLong),
          java.lang.Long.valueOf(eid),
          java.lang.Long.valueOf(1700000000000000L + eid * 1000L),
          types(rng.nextInt(types.length)),
          java.lang.Double.valueOf(rng.nextDouble() * 100),
          doc(i, i))
        val after = before.clone()
        after(5) = doc(i + 1, i + 1)
        (before, after)
      }
      w.gtid("00000000-0000-4000-8000-000000000009", txn + 1L)
      w.query("graft", "BEGIN")
      w.tableMap(td)
      w.updateRows(td, pairs)
      w.xid(txn + 1L)
    }
    w.close()
    new java.io.File(path).length()
  }

  /** The COMPOUNDED wire-minimal mode: `binlog_row_image=MINIMAL` ×
    * PARTIAL_JSON — PK-only before image (the full-update control logs
    * the whole ~1 KB document TWICE per row), changed-columns after
    * image whose JSON cell is the few-byte diff vector. Decode
    * surfaces deferred markers (no before document in the log), so the
    * per-event decode cost here is pure wire parse + base64 — the
    * apply cost moves to the stateful consumer
    * (CdcPipeline.applyDeferredJsonDiffs), priced separately by the
    * st_cdc_binlog_partial_minimal bench row.
    */
  private def writePartialMinimalLog(path: String, nTxn: Int): Long = {
    import graft.streaming.{MysqlJsonBinary, MysqlJsonDiff}
    import MysqlJsonDiff.{Diff, Diffs, OpInsert, OpReplace}
    val rng = new scala.util.Random(78)
    val td = tableDef
    val w = new Writer(path, serverId = 9L)
    w.setClock(1700000000L)
    w.begin()
    w.previousGtids(Seq.empty)
    var eid = 0L
    (0 until nTxn).foreach { txn =>
      val pairs = (0 until 64).map { _ =>
        eid += 1
        val i = (eid % 7).toInt
        val before = Array[AnyRef](
          java.lang.Long.valueOf(rng.nextInt(100000).toLong),
          null, null, null, null, null)
        val after = Array[AnyRef](null,
          java.lang.Long.valueOf(eid),
          java.lang.Long.valueOf(1700000000000000L + eid * 1000L),
          null, null,
          Diffs(Seq(
            Diff(OpReplace, "$.n", Some(MysqlJsonBinary.JInt(i + 1L))),
            Diff(OpInsert, s"$$.tags[$i]",
              Some(MysqlJsonBinary.JStr(s"t$i"))))))
        (before, after)
      }
      w.gtid("00000000-0000-4000-8000-000000000009", txn + 1L)
      w.query("graft", "BEGIN")
      w.tableMap(td)
      w.partialUpdateRows(td, pairs,
        beforePresent = Some(Set(0)),        // MINIMAL: PK only
        afterPresent = Some(Set(1, 2, 5)))   // MINIMAL: changed cols
      w.xid(txn + 1L)
    }
    w.close()
    new java.io.File(path).length()
  }

  def main(args: Array[String]): Unit = {
    val baseTxn = if (args.nonEmpty) args(0).toInt else 2000 // ×64 rows
    for (scale <- Seq(1, 5, 10);
         mode <- Seq("plain", "zstd", "full_update", "partial_json",
           "partial_minimal")) {
      val compressed = mode == "zstd"
      val nTxn = baseTxn * scale
      val path = java.nio.file.Files
        .createTempFile("graft_cdc_bench_", ".binlog").toString
      val bytes = mode match {
        case "partial_json" => writePartialLog(path, nTxn)
        case "partial_minimal" => writePartialMinimalLog(path, nTxn)
        case "full_update" => writeFullUpdateLog(path, nTxn)
        case _ => writeLog(path, nTxn, compressed)
      }
      def once(): (Double, Long) = {
        // the production readers' exact path: streamed bytes → events
        // → change rows, one in-flight event (no file-sized Vectors)
        val t0 = System.nanoTime()
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path))
        var n = 0L
        val it = MysqlBinlog.changeEventsIterator(
          MysqlBinlog.eventIterator(bytes))
        while (it.hasNext) { it.next(); n += 1 }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm-up (JIT, page cache)
      val runs = (1 to 3).map(_ => once())
      val sec = runs.map(_._1).min
      val rows = runs.head._2
      require(rows == nTxn.toLong * 64, s"decoded $rows of ${nTxn * 64}")
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
      println(f"""{"rows":$rows,"bytes":$bytes,"mode":"$mode","sec":$sec%.3f,"events_per_sec":${(rows / sec).toLong},"mb_per_sec":${bytes / 1e6 / sec}%.1f}""")
    }
    // admission-scan leg: the per-trigger pacing pass (header walk +
    // one bounded pread per QUERY event under txn-atomic admission)
    // must stay far cheaper than decode — this is the number that says
    // the txn-fence semantics cost nothing at the tail's throughput
    // ceiling
    for (scale <- Seq(1, 10)) {
      val nTxn = baseTxn * scale
      val path = java.nio.file.Files
        .createTempFile("graft_cdc_bench_adm_", ".binlog").toString
      val bytes = writeLog(path, nTxn, compressed = false)
      for (atomic <- Seq(true, false)) {
        def once(): Double = {
          val t0 = System.nanoTime()
          val a = graft.streaming.MysqlBinlogSource
            .advance(path, 4L, Long.MaxValue, Long.MaxValue, atomic)
          require(a.safe == bytes, s"scan must drain: ${a.safe} of $bytes")
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val sec = (1 to 3).map(_ => once()).min
        val mode = if (atomic) "admission_txn" else "admission_event"
        println(f"""{"rows":${nTxn * 64L},"bytes":$bytes,"mode":"$mode","sec":$sec%.3f,"events_per_sec":${(nTxn * 64L / sec).toLong},"mb_per_sec":${bytes / 1e6 / sec}%.1f}""")
      }
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    }
  }
}
