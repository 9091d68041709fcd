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
    * (VARCHAR/STRING: max byte length; BLOB/GEOMETRY: length-prefix
    * width; temporal2/TIME2: fractional-second precision; FLOAT/DOUBLE:
    * storage size; DECIMAL: precision | scale<<8; BIT:
    * bits%8 | (bits/8)<<8). `labels` carries the declared value list
    * for ENUM/SET columns — emitted as the 8.0 ENUM_STR_VALUE /
    * SET_STR_VALUE TLVs so the reader decodes labels, not ordinals.
    */
  final case class Col(name: String, typ: Int, meta: Int = 0,
                       signed: Boolean = true, nullable: Boolean = true,
                       labels: Seq[String] = Nil,
                       /** collation id for character columns (0 = the
                         * 8.0 default, emitted as utf8mb4); 63 =
                         * binary (VARBINARY/BLOB — byte values); 8 =
                         * latin1, etc. Drives the DEFAULT_CHARSET /
                         * COLUMN_CHARSET TLV and the value encoding.
                         */
                       collation: Int = 0)

  final case class TableDef(tableId: Long, schema: String, name: String,
                            cols: Seq[Col],
                            /** emit per-column COLUMN_CHARSET (TLV 3)
                              * instead of DEFAULT_CHARSET + overrides
                              * (TLV 2) — both real server shapes
                              */
                            columnCharsetTlv: Boolean = false)

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
    /** TIME(fsp) — values are "[-]HH:MM:SS[.frac]" strings in and out */
    def time(name: String, fsp: Int): Col = {
      require(fsp >= 0 && fsp <= 6, s"TIME fsp $fsp")
      Col(name, T_TIME2, fsp)
    }
    /** ENUM('a','b',…) — transmitted on the wire as type 254 with the
      * real type in the metadata (as servers do); values are labels
      * (or Long ordinals) in and out
      */
    def enumCol(name: String, labels: Seq[String]): Col = {
      require(labels.nonEmpty && labels.size <= 0xffff, "ENUM value count")
      Col(name, T_ENUM, if (labels.size > 255) 2 else 1, labels = labels)
    }
    /** SET('a','b',…) — ≤64 members (the decoder's Long bitmask bound) */
    def setCol(name: String, labels: Seq[String]): Col = {
      require(labels.nonEmpty && labels.size <= 64, "SET member count")
      Col(name, T_SET, (labels.size + 7) / 8, labels = labels)
    }
    /** BIT(n), n ≤ 64 — values are Long in and out, big-endian packed */
    def bit(name: String, bits: Int): Col = {
      require(bits >= 1 && bits <= 64, s"BIT($bits)")
      Col(name, T_BIT, (bits % 8) | ((bits / 8) << 8))
    }
    /** GEOMETRY — opaque SRID+WKB bytes, blob-like 4-byte length prefix */
    def geometry(name: String): Col = Col(name, T_GEOMETRY, 4)
    /** CHAR(n) — meta = max byte length (≤1023); the wire metadata
      * folds the high length bits into the type byte, as servers do
      */
    def char(name: String, maxLen: Int): Col = {
      require(maxLen >= 0 && maxLen <= 1023, s"CHAR max byte length $maxLen")
      Col(name, T_STRING, maxLen)
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
      phl(PARTIAL_UPDATE_ROWS_EVENT - 1) = 10 // rows v2 post-header
      phl(ROWS_QUERY_EVENT - 1) = 0
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
      // wire type bytes: ENUM/SET (and CHAR) transmit as type 254 with
      // the real type embedded in the metadata, as servers emit them
      td.cols.foreach { c =>
        b.u1(c.typ match {
          case T_ENUM | T_SET => T_STRING
          case t => t
        })
      }
      val meta = new B()
      td.cols.foreach { c =>
        c.typ match {
          case T_VARCHAR | T_VAR_STRING | T_BIT | T_NEWDECIMAL =>
            meta.u2(c.meta)
          case T_STRING =>
            // byte0 = T_STRING with the CHAR max-length high bits
            // folded in (inverted, the log_event.cc packing); byte1 =
            // low length byte
            meta.u1(T_STRING ^ (((c.meta >> 8) & 0x3) << 4))
              .u1(c.meta & 0xff)
          case T_ENUM =>
            meta.u1(T_ENUM).u1(if (c.labels.size > 255) 2 else 1)
          case T_SET =>
            meta.u1(T_SET).u1((c.labels.size + 7) / 8)
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
      // ENUM_STR_VALUE (6) / SET_STR_VALUE (5) — per column of the
      // type, in table order: lenenc value count, then each value
      // length-prefixed. Emitting these is what lets the reader
      // surface labels instead of ordinals/bitmasks.
      def strValueTlv(tlvType: Int, colType: Int): Unit = {
        val cols = td.cols.filter(_.typ == colType)
        if (cols.nonEmpty) {
          val p = new B()
          cols.foreach { c =>
            p.lenenc(c.labels.size.toLong)
            c.labels.foreach { v =>
              val vb = v.getBytes(StandardCharsets.UTF_8)
              p.lenenc(vb.length.toLong).raw(vb)
            }
          }
          val pb = p.bytes
          b.u1(tlvType).lenenc(pb.length.toLong).raw(pb)
        }
      }
      strValueTlv(6, T_ENUM)
      strValueTlv(5, T_SET)
      // DEFAULT_CHARSET (2) / COLUMN_CHARSET (3) — collations of the
      // CHARACTER columns (CHAR/VARCHAR/TEXT; the is_character_field
      // set), positionally in table order. Emitted whenever any
      // character column declares a collation, as 8.0's
      // binlog_row_metadata=FULL does.
      val charCols = td.cols.filter(c => isCharacterType(c.typ))
      if (charCols.exists(_.collation != 0)) {
        def coll(c: Col): Int = if (c.collation == 0) 255 else c.collation
        val p = new B()
        if (td.columnCharsetTlv) {
          charCols.foreach(c => p.lenenc(coll(c).toLong))
          val pb = p.bytes
          b.u1(3).lenenc(pb.length.toLong).raw(pb)
        } else {
          p.lenenc(255L) // default: utf8mb4_0900_ai_ci
          charCols.zipWithIndex.foreach { case (c, k) =>
            if (coll(c) != 255) p.lenenc(k.toLong).lenenc(coll(c).toLong)
          }
          val pb = p.bytes
          b.u1(2).lenenc(pb.length.toLong).raw(pb)
        }
      }
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

    /** PARTIAL_UPDATE_ROWS (type 39, `binlog_row_value_options=
      * PARTIAL_JSON`, WL#2955): like [[updateRows]], but an after-image
      * cell holding a [[MysqlJsonDiff.Diffs]] is encoded as a JSON diff
      * vector with that column's partial bit set (an empty `Diffs` is
      * the zero-length "unchanged" form). Plain values — including full
      * JSON text — encode as usual with the bit clear. Each row's after
      * image is preceded by its own lenenc `value_options` (+
      * `partial_bits` when any cell of that row is partial), matching
      * the per-row shared-image layout. The bitmap's domain is the
      * JSON columns INCLUDED IN THE AFTER IMAGE (WL#2955) — under
      * `binlog_row_image=MINIMAL` a trimmed image shrinks the bitmap;
      * the 9-JSON-column spec pins the byte count on both sides.
      */
    def partialUpdateRows(td: TableDef,
                          pairs: Seq[(Array[AnyRef], Array[AnyRef])],
                          beforePresent: Option[Set[Int]] = None,
                          afterPresent: Option[Set[Int]] = None): Long = {
      val present = beforePresent.getOrElse(td.cols.indices.toSet)
      val p2 = afterPresent.getOrElse(td.cols.indices.toSet)
      val jsonIdx = td.cols.indices
        .filter(i => td.cols(i).typ == T_JSON && p2.contains(i))
      val b = new B().u6(td.tableId).u2(1) // flags: STMT_END_F
      b.u2(2) // v2 extra-data length (just its own two bytes)
      b.lenenc(td.cols.length.toLong)
      b.bitmap(td.cols.indices.map(present.contains))
      b.bitmap(td.cols.indices.map(p2.contains))
      pairs.foreach { case (before, after) =>
        image(b, td, before, td.cols.indices.filter(present.contains))
        val isPartial = jsonIdx.map(i =>
          after(i).isInstanceOf[MysqlJsonDiff.Diffs])
        b.lenenc(if (isPartial.exists(identity)) 1L else 0L)
        if (isPartial.exists(identity)) b.bitmap(isPartial)
        val presentIdx = td.cols.indices.filter(p2.contains)
        b.bitmap(presentIdx.map(i => after(i) == null))
        presentIdx.foreach { i =>
          after(i) match {
            case null => ()
            case MysqlJsonDiff.Diffs(ds) =>
              val payload = MysqlJsonDiff.encode(ds)
              blobLen(b, td.cols(i), payload.length)
              b.raw(payload)
            case v => encodeValue(b, td.cols(i), v)
          }
        }
      }
      emit(PARTIAL_UPDATE_ROWS_EVENT, b.bytes)
    }

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
          image(b, td, img, td.cols.indices.filter(pres.contains))
        }
      }
      emit(typ, b.bytes)
    }

    /** One row image: null bitmap over the present columns, then the
      * non-null values in table order.
      */
    private def image(b: B, td: TableDef, img: Array[AnyRef],
                      presentIdx: Seq[Int]): Unit = {
      b.bitmap(presentIdx.map(i => img(i) == null))
      presentIdx.foreach { i =>
        if (img(i) != null) encodeValue(b, td.cols(i), img(i))
      }
    }

    /** Length prefix at the column's declared prefix width (BLOB/JSON
      * metadata semantics).
      */
    private def blobLen(b: B, c: Col, len: Int): Unit = (c.meta: @unchecked) match {
      case 1 => require(len <= 0xff, s"${c.name}: $len > 1-byte prefix"); b.u1(len); ()
      case 2 => require(len <= 0xffff, s"${c.name}: $len"); b.u2(len); ()
      case 3 => require(len <= 0xffffff, s"${c.name}: $len"); b.u3(len); ()
      case 4 => b.u4(len.toLong); ()
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
      case (T_VARCHAR | T_VAR_STRING | T_STRING, s: String) =>
        val raw = charEncode(s, c)
        require(raw.length <= c.meta,
          s"value longer (${raw.length}) than CHAR/VARCHAR(${c.meta}) '${c.name}'")
        if (c.meta > 255) b.u2(raw.length) else b.u1(raw.length)
        b.raw(raw)
      case (T_VARCHAR | T_VAR_STRING | T_STRING, a: Array[Byte]) =>
        // binary collation (VARBINARY): byte values
        require(c.collation == 63,
          s"byte value for non-binary character column '${c.name}'")
        require(a.length <= c.meta,
          s"value longer (${a.length}) than VARBINARY(${c.meta}) '${c.name}'")
        if (c.meta > 255) b.u2(a.length) else b.u1(a.length)
        b.raw(a)
      case (T_TIME2, s: String) =>
        val packed = parseTimePacked(s, c.meta)
        val ip = packed >> 24             // arithmetic shift: FLOOR
        val fr = packed % (1L << 24)      // %: TRUNC — the server's mix
        c.meta match {
          case 0 => b.be(0x800000L + ip, 3)
          case 1 | 2 =>
            b.be(0x800000L + ip, 3).u1(((fr / 10000L) & 0xff).toInt)
          case 3 | 4 =>
            b.be(0x800000L + ip, 3).be((fr / 100L) & 0xffffL, 2)
          case 5 | 6 => b.be(0x800000000000L + packed, 6)
          case m => throw new IllegalArgumentException(s"TIME fsp $m")
        }
        ()
      case (T_ENUM, s: String) =>
        val ord = if (s.isEmpty) 0 else c.labels.indexOf(s) + 1
        require(s.isEmpty || ord > 0,
          s"'$s' is not a declared value of ENUM '${c.name}'")
        if (c.labels.size > 255) b.u2(ord) else b.u1(ord)
        ()
      case (T_ENUM, l: java.lang.Long) =>
        require(l >= 0 && l <= c.labels.size,
          s"ENUM ordinal $l outside 0..${c.labels.size} for '${c.name}'")
        if (c.labels.size > 255) b.u2(l.toInt) else b.u1(l.toInt)
        ()
      case (T_SET, s: String) =>
        val mask = if (s.isEmpty) 0L else s.split(",", -1).map { part =>
          val i = c.labels.indexOf(part)
          require(i >= 0,
            s"'$part' is not a declared member of SET '${c.name}'")
          1L << i
        }.reduce(_ | _)
        var i = 0
        val nBytes = (c.labels.size + 7) / 8
        while (i < nBytes) { b.u1(((mask >> (8 * i)) & 0xff).toInt); i += 1 }
      case (T_SET, l: java.lang.Long) =>
        require(c.labels.size == 64 || (l >>> c.labels.size) == 0,
          s"SET bitmask $l has bits beyond ${c.labels.size} members")
        var i = 0
        val nBytes = (c.labels.size + 7) / 8
        while (i < nBytes) { b.u1(((l >> (8 * i)) & 0xff).toInt); i += 1 }
      case (T_BIT, l: java.lang.Long) =>
        val bits = (c.meta >> 8) * 8 + (c.meta & 0xff)
        require(bits == 64 || (l >>> bits) == 0,
          s"value $l does not fit BIT($bits) '${c.name}'")
        b.be(l, (bits + 7) / 8)
        ()
      case (T_BLOB | T_GEOMETRY, a: Array[Byte]) =>
        c.meta match {
          case 1 => b.u1(a.length); case 2 => b.u2(a.length)
          case 3 => b.u3(a.length); case 4 => b.u4(a.length.toLong)
          case m => throw new IllegalArgumentException(s"BLOB meta $m")
        }
        b.raw(a)
      case (T_BLOB, s: String) =>
        // TEXT column: a BLOB with a text collation — charset bytes
        require(c.collation != 0 && c.collation != 63,
          s"string value for BLOB column '${c.name}' needs a text collation")
        val raw = charEncode(s, c)
        c.meta match {
          case 1 => b.u1(raw.length); case 2 => b.u2(raw.length)
          case 3 => b.u3(raw.length); case 4 => b.u4(raw.length.toLong)
          case m => throw new IllegalArgumentException(s"BLOB meta $m")
        }
        b.raw(raw)
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

    /** Encode a character-column value under its collation's charset
      * (UTF-8 when unset — the 8.0 default family) — STRICTLY: a value
      * outside the charset (an em-dash into latin1) must refuse, not
      * ride the wire as the JVM's silent '?' substitution (the
      * decoder's no-silent-wrong-value stance, writer side).
      */
    private def charEncode(s: String, c: Col): Array[Byte] = {
      val cs =
        if (c.collation == 0) StandardCharsets.UTF_8
        else collationCharset(c.collation).getOrElse(
          throw new IllegalArgumentException(
            s"binary collation column '${c.name}' takes byte values"))
      try {
        val bb = cs.newEncoder().encode(java.nio.CharBuffer.wrap(s))
        val a = new Array[Byte](bb.remaining()); bb.get(a); a
      } catch { case _: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"value for column '${c.name}' is not representable in " +
            s"${cs.name()} (collation ${c.collation})")
      }
    }

    private val timeRe = "^(-?)(\\d{1,3}):(\\d{2}):(\\d{2})(?:\\.(\\d{1,6}))?$".r

    /** "[-]H:MM:SS[.frac]" → signed packed TIME ((hms<<24)+micros,
      * negated when negative). Refuses more fractional digits than the
      * column's fsp — silent truncation would "round-trip" by losing
      * data (the DECIMAL codec's stance).
      */
    private def parseTimePacked(s: String, fsp: Int): Long = s match {
      case timeRe(neg, h, mi, se, fr) =>
        val hh = h.toLong; val mm = mi.toLong; val ss = se.toLong
        require(hh <= 838 && mm <= 59 && ss <= 59,
          s"TIME out of range: '$s'")
        val frac = Option(fr).getOrElse("")
        require(frac.length <= fsp,
          s"'$s' carries more fractional digits than TIME($fsp)")
        val micros =
          if (frac.isEmpty) 0L else (frac + "0" * (6 - frac.length)).toLong
        val packed = ((hh << 12 | mm << 6 | ss) << 24) + micros
        if (neg == "-") -packed else packed
      case _ => throw new IllegalArgumentException(s"bad TIME literal '$s'")
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

    /** ROWS_QUERY provenance (`binlog_rows_query_log_events=ON`):
      * the original statement text, written directly before its
      * TABLE_MAP + rows events. The single legacy length byte
      * saturates at 255; the full text follows regardless (the 8.0
      * wire shape).
      */
    def rowsQuery(sql: String): Long = {
      val qb = sql.getBytes(StandardCharsets.UTF_8)
      emit(ROWS_QUERY_EVENT, new B().u1(math.min(qb.length, 255)).raw(qb).bytes)
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
