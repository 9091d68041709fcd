package graft.streaming

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets

import MysqlBinlog._

/** MySQL binlog v4 BINARY format — writer. Produces spec-conformant
  * files (the same layout `mysqlbinlog`/a replication client reads):
  * magic, FORMAT_DESCRIPTION with per-type post-header lengths and
  * CRC32 checksums, per-statement TABLE_MAP (+ 8.0
  * `binlog_row_metadata=FULL` optional TLVs: SIGNEDNESS, COLUMN_NAME),
  * WRITE/UPDATE/DELETE_ROWS v2, XID transaction fences, ROTATE.
  *
  * This is the in-sandbox stand-in for the one thing a live server
  * would provide — the recorded log itself (README "Production
  * boundary"): the engine-side consumer ([[MysqlBinlog]],
  * [[MysqlBinlogSource]]) reads the real wire format, so swapping this
  * writer for a `COM_BINLOG_DUMP_GTID` capture changes nothing
  * downstream. Kept in main (not test) scope because the registered
  * round-trip query encodes the harness fixture through it.
  */
object MysqlBinlogWriter {

  /** Column description: `meta` follows TABLE_MAP metadata semantics
    * (VARCHAR: max byte length; BLOB: length-prefix width; temporal2:
    * fractional-second precision; FLOAT/DOUBLE: storage size).
    */
  final case class Col(name: String, typ: Int, meta: Int = 0,
                       signed: Boolean = true, nullable: Boolean = true)

  final case class TableDef(tableId: Long, schema: String, name: String,
                            cols: Seq[Col])

  /** Convenience column constructors for the §1.2 type ladder. */
  object Col {
    def bigint(name: String): Col = Col(name, T_LONGLONG)
    def int(name: String): Col = Col(name, T_LONG)
    def varchar(name: String, maxLen: Int): Col = Col(name, T_VARCHAR, maxLen)
    def double(name: String): Col = Col(name, T_DOUBLE, 8)
    /** microsecond TIMESTAMP (epoch-micros Long in/out) */
    def timestamp6(name: String): Col = Col(name, T_TIMESTAMP2, 6)
    /** microsecond DATETIME (epoch-micros Long in/out, UTC) */
    def datetime6(name: String): Col = Col(name, T_DATETIME2, 6)
    def blob(name: String): Col = Col(name, T_BLOB, 2)
    def date(name: String): Col = Col(name, T_DATE)
    /** JSON column (binary JSON document, 4-byte length prefix as 8.0
      * writes; values are JSON TEXT in and out)
      */
    def json(name: String): Col = Col(name, T_JSON, 4)
    /** DECIMAL(p, s) — meta packs precision in the low byte, scale in
      * the high byte, matching the TABLE_MAP wire order (precision
      * byte first) under the parser's LE u2 read. Values are
      * java.math.BigDecimal (or their String rendering) in and out.
      */
    def decimal(name: String, precision: Int, scale: Int): Col = {
      require(precision >= 1 && precision <= 65 && scale >= 0 &&
        scale <= 30 && scale <= precision,
        s"invalid DECIMAL($precision,$scale)")
      Col(name, T_NEWDECIMAL, precision | (scale << 8))
    }
  }

  /** Sequential writer over one binlog file. Not thread-safe (a binlog
    * is a serial stream per server — one writer per file, the same
    * constraint the real server has).
    */
  final class Writer(path: String, serverId: Long = 1L,
                     checksum: Boolean = true,
                     serverVersion: String = "8.0.36-graft") {
    private val out = new BufferedOutputStream(new FileOutputStream(path))
    private var pos: Long = 0L
    private var clockSec: Long = 0L

    /** binlog event-header timestamps are second-granular; the writer
      * carries the last-set clock forward so callers set it per
      * transaction, as the server stamps statement commit time.
      */
    def setClock(epochSec: Long): Unit = clockSec = epochSec

    def position: Long = pos

    // -- little byte builder --------------------------------------------
    private final class B {
      val bb = new java.io.ByteArrayOutputStream(256)
      def u1(v: Int): B = { bb.write(v & 0xff); this }
      def u2(v: Int): B = { u1(v); u1(v >> 8) }
      def u3(v: Int): B = { u1(v); u1(v >> 8); u1(v >> 16) }
      def u4(v: Long): B = { u2(v.toInt); u2((v >> 16).toInt) }
      def u6(v: Long): B = { u4(v); u2((v >> 32).toInt) }
      def i8(v: Long): B = { u4(v); u4(v >>> 32) }
      def be(v: Long, n: Int): B = {
        var i = n - 1
        while (i >= 0) { bb.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
        this
      }
      def raw(a: Array[Byte]): B = { bb.write(a); this }
      def str(s: String): B = raw(s.getBytes(StandardCharsets.UTF_8))
      def lenenc(v: Long): B =
        if (v < 0xfb) u1(v.toInt)
        else if (v < 0x10000) { u1(0xfc); u2(v.toInt) }
        else if (v < 0x1000000) { u1(0xfd); u3(v.toInt) }
        else { u1(0xfe); i8(v) }
      def bitmap(bits: Seq[Boolean]): B = {
        val raw = new Array[Byte]((bits.length + 7) / 8)
        bits.zipWithIndex.foreach { case (b, i) =>
          if (b) raw(i / 8) = (raw(i / 8) | (1 << (i % 8))).toByte
        }
        this.raw(raw)
      }
      def bytes: Array[Byte] = bb.toByteArray
    }

    private def emit(eventType: Int, body: Array[Byte],
                     checksummed: Boolean = true): Long = {
      val start = pos
      val withCrc = checksum && checksummed
      val size = CommonHeaderLen + body.length + (if (withCrc) 4 else 0)
      val h = new B()
        .u4(clockSec).u1(eventType).u4(serverId)
        .u4(size.toLong).u4(pos + size).u2(1) // flags: LOG_EVENT_BINLOG_IN_USE_F cleared on close; 1 = STMT_END-ish marker unused here
        .bytes
      out.write(h); out.write(body)
      if (withCrc) {
        val crc = new java.util.zip.CRC32
        crc.update(h); crc.update(body)
        out.write(new B().u4(crc.getValue).bytes)
      }
      pos += size
      start
    }

    /** magic + FORMAT_DESCRIPTION — must be the first call. */
    def begin(): Writer = {
      out.write(Magic); pos = 4
      // post-header lengths for event types 1..41 (8.0 layout incl.
      // TRANSACTION_PAYLOAD=40 and HEARTBEAT_V2=41, both 0; the array
      // is consumed via the FDE itself, so readers use exactly these
      // values)
      val phl = new Array[Int](41)
      phl(QUERY_EVENT - 1) = 13
      phl(ROTATE_EVENT - 1) = 8
      phl(FORMAT_DESCRIPTION_EVENT - 1) = 2 + 50 + 4 + 1 + 41
      phl(TABLE_MAP_EVENT - 1) = 8
      phl(WRITE_ROWS_V1 - 1) = 8; phl(UPDATE_ROWS_V1 - 1) = 8
      phl(DELETE_ROWS_V1 - 1) = 8
      phl(WRITE_ROWS_EVENT - 1) = 10; phl(UPDATE_ROWS_EVENT - 1) = 10
      phl(DELETE_ROWS_EVENT - 1) = 10
      phl(GTID_EVENT - 1) = 42; phl(ANONYMOUS_GTID_EVENT - 1) = 42
      val b = new B().u2(4)
      val ver = serverVersion.getBytes(StandardCharsets.UTF_8)
      b.raw(java.util.Arrays.copyOf(ver, 50)) // NUL-padded to 50
      b.u4(clockSec).u1(CommonHeaderLen)
      phl.foreach(b.u1)
      if (checksum) b.u1(ChecksumCrc32) else b.u1(ChecksumOff)
      // the FDE's own CRC is computed like every other event's
      emit(FORMAT_DESCRIPTION_EVENT, b.bytes, checksummed = checksum)
      this
    }

    def tableMap(td: TableDef): Long = {
      val b = new B().u6(td.tableId).u2(1)
      val schema = td.schema.getBytes(StandardCharsets.UTF_8)
      val name = td.name.getBytes(StandardCharsets.UTF_8)
      b.u1(schema.length).raw(schema).u1(0)
      b.u1(name.length).raw(name).u1(0)
      b.lenenc(td.cols.length.toLong)
      td.cols.foreach(c => b.u1(c.typ))
      val meta = new B()
      td.cols.foreach { c =>
        c.typ match {
          case T_VARCHAR | T_VAR_STRING | T_BIT | T_NEWDECIMAL | T_STRING |
               T_ENUM | T_SET => meta.u2(c.meta)
          case T_BLOB | T_TINY_BLOB | T_MEDIUM_BLOB | T_LONG_BLOB |
               T_FLOAT | T_DOUBLE | T_TIMESTAMP2 | T_DATETIME2 | T_TIME2 |
               T_JSON | T_GEOMETRY => meta.u1(c.meta)
          case _ => ()
        }
      }
      val metaBytes = meta.bytes
      b.lenenc(metaBytes.length.toLong).raw(metaBytes)
      b.bitmap(td.cols.map(_.nullable))
      // 8.0 optional metadata (binlog_row_metadata=FULL subset):
      // SIGNEDNESS — one bit per numeric column, MSB-first, set=UNSIGNED
      val numeric = td.cols.filter(c => isNumericType(c.typ))
      if (numeric.nonEmpty) {
        val raw = new Array[Byte]((numeric.length + 7) / 8)
        numeric.zipWithIndex.foreach { case (c, k) =>
          if (!c.signed) raw(k / 8) = (raw(k / 8) | (1 << (7 - (k % 8)))).toByte
        }
        b.u1(1).lenenc(raw.length.toLong).raw(raw)
      }
      // COLUMN_NAME — length-prefixed names
      val namesPayload = new B()
      td.cols.foreach { c =>
        val nb = c.name.getBytes(StandardCharsets.UTF_8)
        namesPayload.lenenc(nb.length.toLong).raw(nb)
      }
      val np = namesPayload.bytes
      b.u1(4).lenenc(np.length.toLong).raw(np)
      emit(TABLE_MAP_EVENT, b.bytes)
    }

    private def isNumericType(t: Int): Boolean = t match {
      case T_TINY | T_SHORT | T_INT24 | T_LONG | T_LONGLONG | T_FLOAT |
           T_DOUBLE | T_NEWDECIMAL | T_YEAR => true
      case _ => false
    }

    /** WRITE_ROWS v2. `rows` are full images aligned to `td.cols`
      * (under `binlog_row_image=MINIMAL` an INSERT's after image still
      * carries every column — the statement sets them all).
      */
    def writeRows(td: TableDef, rows: Seq[Array[AnyRef]]): Long =
      rowsEvent(WRITE_ROWS_EVENT, td, rows.map(r => Seq(r)),
        td.cols.indices.toSet)

    /** UPDATE_ROWS v2: (before, after) image pairs. `beforePresent` /
      * `afterPresent` trim each side's column set independently —
      * `binlog_row_image=MINIMAL` logs the before image as PK-only and
      * the after image as ONLY the columns the statement changed (the
      * two images have SEPARATE columns-present bitmaps on the wire,
      * which is exactly why the format has two).
      */
    def updateRows(td: TableDef,
                   pairs: Seq[(Array[AnyRef], Array[AnyRef])],
                   beforePresent: Option[Set[Int]] = None,
                   afterPresent: Option[Set[Int]] = None): Long =
      rowsEvent(UPDATE_ROWS_EVENT, td, pairs.map(p => Seq(p._1, p._2)),
        beforePresent.getOrElse(td.cols.indices.toSet),
        afterPresent.getOrElse(td.cols.indices.toSet))

    /** DELETE_ROWS v2. `presentCols` trims the row image to a column
      * subset (`binlog_row_image=MINIMAL` — typically just the PK);
      * values for absent columns are ignored.
      */
    def deleteRows(td: TableDef, rows: Seq[Array[AnyRef]],
                   presentCols: Option[Set[Int]] = None): Long =
      rowsEvent(DELETE_ROWS_EVENT, td, rows.map(r => Seq(r)),
        presentCols.getOrElse(td.cols.indices.toSet))

    /** `present2` applies to every second image of each row (the UPDATE
      * after image); non-update events pass the same set twice.
      */
    private def rowsEvent(typ: Int, td: TableDef,
                          rows: Seq[Seq[Array[AnyRef]]],
                          present: Set[Int],
                          present2: Set[Int] = null): Long = {
      val p2 = if (present2 == null) present else present2
      val b = new B().u6(td.tableId).u2(1) // flags: STMT_END_F
      b.u2(2) // v2 extra-data length (just its own two bytes)
      b.lenenc(td.cols.length.toLong)
      b.bitmap(td.cols.indices.map(present.contains))
      if (typ == UPDATE_ROWS_EVENT)
        b.bitmap(td.cols.indices.map(p2.contains)) // after-image bitmap
      rows.foreach { images =>
        images.zipWithIndex.foreach { case (img, k) =>
          val pres = if (k % 2 == 1) p2 else present
          val presentIdx = td.cols.indices.filter(pres.contains)
          val nulls = presentIdx.map(i => img(i) == null)
          b.bitmap(nulls)
          presentIdx.foreach { i =>
            if (img(i) != null) encodeValue(b, td.cols(i), img(i))
          }
        }
      }
      emit(typ, b.bytes)
    }

    private def encodeValue(b: B, c: Col, v: AnyRef): Unit = (c.typ, v) match {
      case (T_TINY, l: java.lang.Long) => b.u1(l.toInt)
      case (T_SHORT, l: java.lang.Long) => b.u2(l.toInt)
      case (T_INT24, l: java.lang.Long) => b.u3(l.toInt)
      case (T_LONG, l: java.lang.Long) => b.u4(l.longValue())
      case (T_LONGLONG, l: java.lang.Long) => b.i8(l.longValue())
      case (T_YEAR, l: java.lang.Long) =>
        b.u1(if (l == 0L) 0 else (l - 1900L).toInt)
      case (T_FLOAT, f: java.lang.Float) =>
        b.u4(java.lang.Integer.toUnsignedLong(java.lang.Float.floatToIntBits(f)))
      case (T_DOUBLE, d: java.lang.Double) =>
        b.i8(java.lang.Double.doubleToLongBits(d))
      case (T_DATE, s: String) =>
        val d = java.time.LocalDate.parse(s)
        b.u3(d.getDayOfMonth | (d.getMonthValue << 5) | (d.getYear << 9))
      case (T_TIMESTAMP2, micros: java.lang.Long) =>
        b.be(java.lang.Math.floorDiv(micros, 1000000L), 4)
        fracBytes(b, java.lang.Math.floorMod(micros, 1000000L), c.meta)
      case (T_DATETIME2, micros: java.lang.Long) =>
        val dt = java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(micros, 1000000L), 0,
          java.time.ZoneOffset.UTC)
        val ym = dt.getYear * 13L + dt.getMonthValue
        val packed = 0x8000000000L +
          ((ym << 22) | (dt.getDayOfMonth.toLong << 17) |
            (dt.getHour.toLong << 12) | (dt.getMinute.toLong << 6) |
            dt.getSecond.toLong)
        b.be(packed, 5)
        fracBytes(b, java.lang.Math.floorMod(micros, 1000000L), c.meta)
      case (T_VARCHAR | T_VAR_STRING, s: String) =>
        val raw = s.getBytes(StandardCharsets.UTF_8)
        require(raw.length <= c.meta,
          s"value longer (${raw.length}) than VARCHAR(${c.meta}) '${c.name}'")
        if (c.meta > 255) b.u2(raw.length) else b.u1(raw.length)
        b.raw(raw)
      case (T_STRING, s: String) =>
        val raw = s.getBytes(StandardCharsets.UTF_8)
        if ((c.meta & 0xff) > 255) b.u2(raw.length) else b.u1(raw.length)
        b.raw(raw)
      case (T_BLOB, a: Array[Byte]) =>
        c.meta match {
          case 1 => b.u1(a.length); case 2 => b.u2(a.length)
          case 3 => b.u3(a.length); case 4 => b.u4(a.length.toLong)
          case m => throw new IllegalArgumentException(s"BLOB meta $m")
        }
        b.raw(a)
      case (T_NEWDECIMAL, d: java.math.BigDecimal) =>
        b.raw(MysqlDecimalBinary.encode(d, c.meta & 0xff, (c.meta >> 8) & 0xff))
      case (T_NEWDECIMAL, s: String) =>
        b.raw(MysqlDecimalBinary.encode(new java.math.BigDecimal(s),
          c.meta & 0xff, (c.meta >> 8) & 0xff))
      case (T_JSON, s: String) =>
        // value is JSON TEXT; the column stores the binary document
        val doc = MysqlJsonBinary.encode(s)
        c.meta match {
          case 2 => b.u2(doc.length); case 3 => b.u3(doc.length)
          case 4 => b.u4(doc.length.toLong)
          case m => throw new IllegalArgumentException(s"JSON meta $m")
        }
        b.raw(doc)
      case (t, x) => throw new IllegalArgumentException(
        s"cannot encode ${if (x == null) "null" else x.getClass.getName} as column type $t")
    }

    private def fracBytes(b: B, micros: Long, fsp: Int): Unit = fsp match {
      case 0 => ()
      case 1 | 2 => b.be(micros / 10000L, 1); ()
      case 3 | 4 => b.be(micros / 100L, 2); ()
      case 5 | 6 => b.be(micros, 3); ()
      case m => throw new IllegalArgumentException(s"bad fsp $m")
    }

    /** QUERY_EVENT (statement text). An 8.0 ROW-format log emits
      * `BEGIN` as each transaction's first statement event, directly
      * after its GTID — [[MysqlBinlogFixture]] reproduces that wire
      * order. Post-header (13 bytes, as the FDE declares): thread_id(4)
      * exec_time(4) schema_len(1) error_code(2) status_len(2); payload:
      * status vars (none here), schema name, NUL, query text.
      */
    def query(schema: String, sql: String): Long = {
      val sb = schema.getBytes(StandardCharsets.UTF_8)
      emit(QUERY_EVENT, new B().u4(0L).u4(0L).u1(sb.length).u2(0).u2(0)
        .raw(sb).u1(0).str(sql).bytes)
    }

    /** transaction fence (commit marker) */
    def xid(id: Long): Long = emit(XID_EVENT, new B().i8(id).bytes)

    /** TRANSACTION_PAYLOAD_EVENT (8.0.20+
      * `binlog_transaction_compression=ON`): wrap the events `body`
      * writes — a whole transaction's BEGIN/TABLE_MAP/rows/XID — into
      * one zstd-compressed wrapper event. The inner events are encoded
      * checksum-free (the wrapper's CRC covers them, as on the real
      * wire); the TLV header carries compression type, uncompressed
      * size, and payload size, terminated by the end mark.
      */
    def transactionPayload(compress: Boolean = true)
                          (body: Writer => Unit): Long = {
      val tmp = java.nio.file.Files
        .createTempFile("graft_tp_inner_", ".bin")
      val inner = new Writer(tmp.toString, serverId, checksum = false)
      inner.clockSec = clockSec
      try body(inner) finally inner.close()
      val raw = java.nio.file.Files.readAllBytes(tmp)
      java.nio.file.Files.delete(tmp)
      val payload =
        if (compress) com.github.luben.zstd.Zstd.compress(raw, 3)
        else raw
      val b = new B()
      // TLV: (type lenenc, length lenenc, value) — ints are lenenc too,
      // and each declared length is net_length_size(value), the byte
      // width of the value's OWN lenenc (MySQL's codec skips fields by
      // this length, so 255 = NONE must declare 3, not 1)
      def lenencLen(v: Long): Int =
        if (v < 0xfb) 1 else if (v < 0x10000) 3
        else if (v < 0x1000000) 4 else 9
      val ctype = if (compress) 0L else 255L
      b.u1(2).lenenc(lenencLen(ctype).toLong)
        .lenenc(ctype) // compression type
      if (compress)
        b.u1(3).lenenc(lenencLen(raw.length.toLong).toLong)
          .lenenc(raw.length.toLong) // uncompressed size
      b.u1(1).lenenc(lenencLen(payload.length.toLong).toLong)
        .lenenc(payload.length.toLong) // payload size
      b.u1(0) // header end mark
      b.raw(payload)
      emit(TRANSACTION_PAYLOAD_EVENT, b.bytes)
    }

    /** GTID_LOG_EVENT preceding a transaction: flags + 16-byte source
      * uuid + gno, then the 8.0 logical-clock block (type 2 +
      * last_committed + sequence_number, zeroed — readers positioning a
      * replica ignore it), matching the FDE's declared 42-byte
      * post-header.
      */
    def gtid(uuid: String, gno: Long): Long = {
      val hex = uuid.replace("-", "").toLowerCase
      require(hex.length == 32 && hex.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
        s"gtid uuid must be 32 hex digits, got '$uuid'")
      val sid = hex.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      emit(GTID_EVENT,
        new B().u1(1).raw(sid).i8(gno).u1(2).i8(0L).i8(0L).bytes)
    }

    /** Make everything written so far visible to a concurrent reader —
      * the live-server shape a streaming tail sees: the log grows in
      * place while the source's `advance` admits only whole events.
      */
    def flush(): Unit = out.flush()

    /** PREVIOUS_GTIDS (a real log's second event): the executed set at
      * this log's start. Intervals are CLOSED here (`(start, last)`)
      * and encoded end-exclusive on the wire, as the server does.
      */
    def previousGtids(sets: Seq[(String, Seq[(Long, Long)])]): Long = {
      val b = new B().i8(sets.length.toLong)
      sets.foreach { case (uuid, ivs) =>
        val hex = uuid.replace("-", "").toLowerCase
        require(hex.length == 32, s"uuid must be 32 hex digits: '$uuid'")
        b.raw(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        b.i8(ivs.length.toLong)
        ivs.foreach { case (s, last) => b.i8(s).i8(last + 1) }
      }
      emit(PREVIOUS_GTIDS_EVENT, b.bytes)
    }

    /** ROTATE to a successor file (the last event of a closed log) */
    def rotate(nextFile: String, position: Long = 4L): Long =
      emit(ROTATE_EVENT, new B().i8(position).str(nextFile).bytes)

    def close(): Unit = { out.flush(); out.close() }
  }
}
