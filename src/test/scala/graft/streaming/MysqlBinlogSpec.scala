package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import MysqlBinlog._
import MysqlBinlogWriter.{Col, TableDef, Writer}

/** Field-exact round-trip coverage of the binlog v4 wire format:
  * [[MysqlBinlogWriter]] encodes, [[MysqlBinlog]] decodes, and every
  * assertion is on decoded VALUES (not just event counts) — nulls,
  * negative ints, unsigned ints, µs timestamps, quote/escape-bearing
  * strings, BLOB bytes, minimal delete images. Pure JVM: no
  * SparkSession, so the whole suite runs in milliseconds.
  */
class MysqlBinlogSpec extends AnyFunSuite {

  private def tmpLog(): String =
    Files.createTempFile("graft_binlog_spec_", ".binlog").toString

  /** One table exercising the full §1.2 type ladder the source carries. */
  private val ladder = TableDef(7L, "graft", "ladder", Seq(
    Col.bigint("id"),
    Col("tiny_s", T_TINY),
    Col("tiny_u", T_TINY, signed = false),
    Col("short_s", T_SHORT),
    Col("med_s", T_INT24),
    Col("int_s", T_LONG),
    Col("yr", T_YEAR),
    Col("f", T_FLOAT, 4),
    Col.double("d"),
    Col.date("dt"),
    Col.timestamp6("ts6"),
    Col.datetime6("dtm6"),
    Col.varchar("vc", 300),
    Col("ch", T_STRING, 40),
    Col.blob("bl")))

  private def ladderRow(id: Long): Array[AnyRef] = Array[AnyRef](
    java.lang.Long.valueOf(id),
    java.lang.Long.valueOf(-56L),              // signed TINY: wraps via byte
    java.lang.Long.valueOf(200L),              // unsigned TINY: stays 200
    java.lang.Long.valueOf(-30000L),
    java.lang.Long.valueOf(-8123456L),
    java.lang.Long.valueOf(-2000000000L),
    java.lang.Long.valueOf(2024L),
    java.lang.Float.valueOf(1.5f),
    java.lang.Double.valueOf(-2.718281828459045),
    "2024-02-29",                              // leap day through the u3 pack
    java.lang.Long.valueOf(1700000000123456L), // µs TIMESTAMP2(6)
    java.lang.Long.valueOf(1700000000654321L), // µs DATETIME2(6)
    "it's a \"quoted\"\n\ttext — naïve ✓",     // quotes + escapes + non-ASCII
    "fixed",
    Array[Byte](0, 1, -1, 127, -128))

  private def writeLadder(path: String, checksum: Boolean = true)
      (body: Writer => Unit): Vector[Event] = {
    val w = new Writer(path, serverId = 5L, checksum = checksum)
    w.setClock(1700000000L)
    w.begin()
    body(w)
    w.close()
    parseFile(path)
  }

  private def rowsEvents(evs: Seq[Event]): Seq[RowsEvent] =
    evs.collect { case r: RowsEvent => r }

  test("WRITE_ROWS v2 round-trips the full type ladder field-exactly") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder)
      w.writeRows(ladder, Seq(ladderRow(1L)))
      w.xid(1L)
    }
    val re = rowsEvents(evs).head
    assert(re.eventType == WRITE_ROWS_EVENT)
    val (before, after) = re.rows.head
    assert(before.isEmpty)
    val vals = after.get.values.map(_.get)
    val want = ladderRow(1L)
    assert(vals(0) == 1L && vals(1) == -56L && vals(2) == 200L)
    assert(vals(3) == -30000L && vals(4) == -8123456L && vals(5) == -2000000000L)
    assert(vals(6) == 2024L)
    assert(vals(7) == 1.5f)
    assert(vals(8) == -2.718281828459045)
    assert(vals(9) == "2024-02-29")
    assert(vals(10) == 1700000000123456L, "µs TIMESTAMP2 must survive exactly")
    assert(vals(11) == 1700000000654321L, "µs DATETIME2 must survive exactly")
    assert(vals(12) == want(12))
    assert(vals(13) == "fixed")
    assert(java.util.Arrays.equals(vals(14).asInstanceOf[Array[Byte]],
      want(14).asInstanceOf[Array[Byte]]))
  }

  test("fuzz: random schemas and rows round-trip field-exactly (seeded)") {
    // seeded manual generator (offline cache has no scalacheck bridge):
    // random column mixes over the type ladder, random row counts,
    // nulls, negative ints, boundary longs, unicode/quote strings,
    // random blobs — every field must survive the wire bit-exactly
    val rng = new scala.util.Random(4242)
    def randString(maxBytes: Int): String = {
      val n = rng.nextInt(math.max(1, math.min(maxBytes / 4, 40)))
      // code POINTS, not chars — indexing a String over an emoji would
      // split its surrogate pair into unencodable lone halves
      val alphabet = Seq("a", "b", "\"", "'", "\\", "\n", "\t", " ",
        "µ", "ß", "∆", "😀", "中")
      (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    // random canonical JSON text (object/array/scalar) for T_JSON cols
    def randJson(depth: Int): String = rng.nextInt(if (depth > 2) 6 else 8) match {
      case 0 => "null"
      case 1 => if (rng.nextBoolean()) "true" else "false"
      case 2 => (rng.nextInt(200000) - 100000).toString
      case 3 => rng.nextLong().toString
      case 4 => java.lang.Double.toString(rng.nextDouble() * 1e9)
      case 5 => "\"" + (0 until rng.nextInt(10)).map(_ =>
        "ab9µ中"(rng.nextInt(5))).mkString + "\""
      case 6 => (0 until rng.nextInt(4)).map(_ => randJson(depth + 1))
        .mkString("[", ",", "]")
      case 7 => (0 until rng.nextInt(4)).zipWithIndex.map { case (_, i) =>
        s""""k$i":${randJson(depth + 1)}""" }.mkString("{", ",", "}")
    }
    for (iter <- 1 to 120) {
      val nCols = 1 + rng.nextInt(7)
      val cols = (0 until nCols).map { i =>
        rng.nextInt(12) match {
          case 0 => Col.bigint(s"c$i")
          case 1 => Col.int(s"c$i")
          case 2 => Col.varchar(s"c$i", 16 + rng.nextInt(300))
          case 3 => Col.double(s"c$i")
          case 4 => Col.timestamp6(s"c$i")
          case 5 => Col.blob(s"c$i")
          case 6 => Col.json(s"c$i")
          case 7 =>
            val p = 1 + rng.nextInt(30)
            Col.decimal(s"c$i", p, rng.nextInt(math.min(p, 30) + 1))
          case 8 => Col.time(s"c$i", rng.nextInt(7))
          case 9 => // occasionally >255 values: the 2-byte ordinal path
            val n = 1 + rng.nextInt(if (rng.nextInt(10) == 0) 300 else 12)
            Col.enumCol(s"c$i", (0 until n).map(j => s"v$j"))
          case 10 =>
            Col.setCol(s"c$i", (0 until 1 + rng.nextInt(64)).map(j => s"m$j"))
          case 11 => Col.bit(s"c$i", 1 + rng.nextInt(64))
        }
      }
      val td = TableDef(50L + iter, "fz", s"t$iter", cols)
      def value(c: Col): AnyRef =
        if (rng.nextInt(5) == 0) null
        else c.typ match {
          case T_LONGLONG => java.lang.Long.valueOf(rng.nextLong() match {
            case x if iter % 10 == 0 => Long.MinValue + math.abs(x % 3)
            case x => x
          })
          case T_LONG => java.lang.Long.valueOf(
            (rng.nextInt().toLong))
          case T_VARCHAR => randString(c.meta)
          case T_DOUBLE => java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(rng.nextLong()) match {
              case d if d.isNaN => -0.0
              case d => d
            })
          case T_TIMESTAMP2 => java.lang.Long.valueOf(
            math.abs(rng.nextLong() % 4102444800000000L))
          case T_BLOB =>
            val b = new Array[Byte](rng.nextInt(300)); rng.nextBytes(b); b
          case T_JSON => randJson(0)
          case T_NEWDECIMAL =>
            // random digit string within (p, s): signs, leading zeros,
            // all-integer and all-fraction shapes all arise
            val p = c.meta & 0xff; val s = (c.meta >> 8) & 0xff
            val nd = 1 + rng.nextInt(p)
            val digits = (0 until nd).map(_ => ('0' + rng.nextInt(10)).toChar)
              .mkString
            val sign = if (rng.nextBoolean()) "-" else ""
            new java.math.BigDecimal(
              new java.math.BigInteger(sign + digits), s)
          case T_TIME2 =>
            // canonical render at the column's fsp (exactly fsp frac
            // digits); negative only when nonzero — "-00:00:00" has no
            // wire identity distinct from zero
            val fsp = c.meta
            val h = rng.nextInt(839); val mi = rng.nextInt(60)
            val se = rng.nextInt(60)
            val frac = (0 until fsp).map(_ => ('0' + rng.nextInt(10)).toChar)
              .mkString
            val nonzero = h + mi + se > 0 || frac.exists(_ != '0')
            val sign = if (nonzero && rng.nextBoolean()) "-" else ""
            f"$sign$h%02d:$mi%02d:$se%02d" +
              (if (fsp > 0) "." + frac else "")
          case T_ENUM =>
            if (rng.nextInt(8) == 0) ""
            else c.labels(rng.nextInt(c.labels.size))
          case T_SET =>
            val mask = rng.nextLong() &
              (if (c.labels.size == 64) -1L else (1L << c.labels.size) - 1)
            c.labels.indices.filter(j => (mask & (1L << j)) != 0)
              .map(c.labels).mkString(",")
          case T_BIT =>
            val bits = (c.meta >> 8) * 8 + (c.meta & 0xff)
            java.lang.Long.valueOf(rng.nextLong() &
              (if (bits == 64) -1L else (1L << bits) - 1))
        }
      val rows = (0 until (1 + rng.nextInt(4)))
        .map(_ => cols.map(value).toArray)
      val path = tmpLog()
      val w = new Writer(path, serverId = 5L, checksum = iter % 3 != 0)
      w.setClock(1700000000L); w.begin()
      // every 4th case rides inside a TRANSACTION_PAYLOAD wrapper
      // (zstd-compressed, or NONE every 8th) — the unwrap path must be
      // transparent for ANY schema/row mix the plain path accepts
      if (iter % 4 == 0)
        w.transactionPayload(compress = iter % 8 != 0) { inner =>
          inner.tableMap(td); inner.writeRows(td, rows); inner.xid(1L)
        }
      else {
        w.tableMap(td); w.writeRows(td, rows); w.xid(1L)
      }
      w.close()
      val evs = parseFile(path)
      val got = rowsEvents(evs).head.rows.map(_._2.get.values.map(_.orNull))
      assert(got.size == rows.size)
      rows.zip(got).foreach { case (want, g) =>
        want.toSeq.zip(g).zip(cols).foreach { case ((wv, gv), c) =>
          (wv, gv) match {
            case (null, null) => ()
            case (a: Array[Byte], b: Array[Byte]) =>
              assert(java.util.Arrays.equals(a, b),
                s"iter $iter ${c.name}: blob mismatch")
            case _ => assert(wv == gv,
              s"iter $iter ${c.name} (${c.typ}): $wv != $gv")
          }
        }
      }
    }
  }

  test("NEWDECIMAL: wire sizes match MySQL's published storage table") {
    // DECIMAL storage sizes from the public reference manual
    // (data-type storage requirements): each 9-digit side group is 4
    // bytes; leftovers per dig2bytes. These exact numbers are what a
    // REAL server's row images occupy, so the fixed-length cursor walk
    // stays aligned on genuine logs.
    assert(MysqlDecimalBinary.binSize(10, 2) == 5)
    assert(MysqlDecimalBinary.binSize(18, 9) == 8)
    assert(MysqlDecimalBinary.binSize(18, 0) == 8)
    assert(MysqlDecimalBinary.binSize(9, 9) == 4)
    assert(MysqlDecimalBinary.binSize(1, 0) == 1)
    assert(MysqlDecimalBinary.binSize(65, 30) == 30)
  }

  test("NEWDECIMAL: boundary values round-trip with exact scale") {
    def rt(s: String, p: Int, sc: Int): java.math.BigDecimal =
      MysqlDecimalBinary.decode(
        MysqlDecimalBinary.encode(new java.math.BigDecimal(s), p, sc), p, sc)
    // trailing zeros preserved — the reference's battle (sync.py:77-83)
    assert(rt("12.50", 10, 2).toPlainString == "12.50")
    assert(rt("0", 10, 2).toPlainString == "0.00")
    assert(rt("-0.01", 10, 2).toPlainString == "-0.01")
    // negative one's-complement path, both partial-group shapes
    assert(rt("-99999999.99", 10, 2).toPlainString == "-99999999.99")
    assert(rt("-0.000000001", 9, 9).toPlainString == "-0.000000001")
    // max precision/scale (multi-group both sides of the point)
    val big = "-" + ("9" * 35) + "." + ("9" * 30)
    assert(rt(big, 65, 30).toPlainString == big)
    // a value that needs rounding must refuse, not silently truncate
    intercept[MysqlDecimalBinary.DecimalBinaryException] {
      MysqlDecimalBinary.encode(new java.math.BigDecimal("1.999"), 10, 2)
    }
    intercept[MysqlDecimalBinary.DecimalBinaryException] {
      MysqlDecimalBinary.encode(new java.math.BigDecimal("123.45"), 4, 2)
    }
  }

  test("NEWDECIMAL rides a row image beside other columns") {
    val td = TableDef(77L, "graft", "ledger", Seq(
      Col.bigint("id"), Col.decimal("amt", 24, 6),
      Col.decimal("pct", 5, 2), Col.varchar("memo", 40)))
    val path = tmpLog()
    val w = new Writer(path, serverId = 5L)
    w.setClock(1700000000L); w.begin()
    w.tableMap(td)
    w.writeRows(td, Seq(
      Array[AnyRef](java.lang.Long.valueOf(1L),
        new java.math.BigDecimal("123456789012.345678"),
        new java.math.BigDecimal("-9.05"), "first"),
      Array[AnyRef](java.lang.Long.valueOf(2L),
        new java.math.BigDecimal("0.000001"), null, "second")))
    w.xid(1L)
    w.close()
    val rows = rowsEvents(parseFile(path)).head.rows
    val r1 = rows(0)._2.get.values.map(_.orNull)
    assert(r1(1) == new java.math.BigDecimal("123456789012.345678"))
    assert(r1(2) == new java.math.BigDecimal("-9.05"))
    assert(r1(3) == "first")
    val r2 = rows(1)._2.get.values.map(_.orNull)
    assert(r2(1) == new java.math.BigDecimal("0.000001"))
    assert(r2(2) == null && r2(3) == "second")
  }

  test("TIME2/ENUM/SET/BIT/GEOMETRY/CHAR round-trip field-exactly") {
    val td = TableDef(88L, "graft", "ladder2", Seq(
      Col.bigint("id"),
      Col.time("t0", 0),
      Col.time("t2", 2),
      Col.time("t2n", 2),   // negative WITH separate frac bytes — the
                            // mixed floor/trunc wire layout
      Col.time("t6", 6),
      Col.time("t6n", 6),
      Col.enumCol("ev", Seq("click", "view", "purchase", "signup", "error")),
      Col.enumCol("ev_inv", Seq("a", "b")),
      Col.setCol("fl", Seq("a", "b", "c", "d")),
      Col.setCol("fl_empty", Seq("x", "y")),
      Col.bit("b20", 20),
      Col.bit("b64", 64),
      Col.geometry("g"),
      Col.char("ch", 300))) // >255: 2-byte length prefix + the type
                            // byte's folded high length bits
    val row = Array[AnyRef](
      java.lang.Long.valueOf(1L),
      "812:30:45",              // 10-bit hour range
      "00:00:00.05",
      "-01:02:03.45",
      "838:59:58.999999",
      "-00:00:00.000001",       // tiny negative: int part borrows
      "view",
      "",                       // MySQL's invalid-value ENUM sentinel
      "a,c",
      "",
      java.lang.Long.valueOf(0xABCDEL),
      java.lang.Long.valueOf(-1L), // all 64 bits set
      Array[Byte](0, 1, 2, -128, 127, 0),
      "padded-char-value")
    val path = tmpLog()
    val w = new Writer(path, serverId = 5L)
    w.setClock(1700000000L); w.begin()
    w.tableMap(td)
    w.writeRows(td, Seq(row))
    w.xid(1L)
    w.close()
    val evs = parseFile(path)
    val tm = evs.collect { case t: TableMap => t }.head
    // the wire carried type 254 for ENUM/SET; the parser must resolve
    // the embedded real types and bind the string-value TLVs by column
    assert(tm.colTypes(6) == T_ENUM && tm.colTypes(8) == T_SET)
    assert(tm.colTypes(13) == T_STRING && tm.colMeta(13) == 300)
    assert(tm.enumSetLabels(6).toSeq ==
      Seq("click", "view", "purchase", "signup", "error"))
    assert(tm.enumSetLabels(8).toSeq == Seq("a", "b", "c", "d"))
    val vals = rowsEvents(evs).head.rows.head._2.get.values.map(_.orNull)
    assert(vals(1) == "812:30:45")
    assert(vals(2) == "00:00:00.05")
    assert(vals(3) == "-01:02:03.45")
    assert(vals(4) == "838:59:58.999999")
    assert(vals(5) == "-00:00:00.000001")
    assert(vals(6) == "view")
    assert(vals(7) == "")
    assert(vals(8) == "a,c")
    assert(vals(9) == "")
    assert(vals(10) == 0xABCDEL)
    assert(vals(11) == -1L)
    assert(java.util.Arrays.equals(vals(12).asInstanceOf[Array[Byte]],
      row(12).asInstanceOf[Array[Byte]]))
    assert(vals(13) == "padded-char-value")
  }

  test("TIME2 writer refuses range abuse and precision loss") {
    val td = TableDef(89L, "graft", "t", Seq(
      Col.bigint("id"), Col.time("t2", 2)))
    val path = tmpLog()
    val w = new Writer(path, serverId = 5L)
    w.setClock(1700000000L); w.begin()
    w.tableMap(td)
    // more fractional digits than TIME(2) must refuse, not truncate
    intercept[IllegalArgumentException] {
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "00:00:01.123")))
    }
    intercept[IllegalArgumentException] {
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "839:00:00")))
    }
    w.close()
  }

  test("ENUM/SET writer refuses undeclared values") {
    val td = TableDef(90L, "graft", "t", Seq(
      Col.bigint("id"),
      Col.enumCol("e", Seq("a", "b")), Col.setCol("s", Seq("x", "y"))))
    val path = tmpLog()
    val w = new Writer(path, serverId = 5L)
    w.setClock(1700000000L); w.begin()
    w.tableMap(td)
    intercept[IllegalArgumentException] {
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "zz", "x")))
    }
    intercept[IllegalArgumentException] {
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "a", "x,zz")))
    }
    w.close()
  }

  test("column charsets: latin1/binary/TEXT decode under the charset TLVs") {
    // a legacy latin1 column's 0xE9 ('é') is NOT valid UTF-8 — without
    // the DEFAULT_CHARSET/COLUMN_CHARSET TLVs the decode would surface
    // a silent replacement character; with them the bytes round-trip
    // through the column's real charset
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    def run(columnCharsetTlv: Boolean): Unit = {
      val td = TableDef(91L, "graft", "legacy", Seq(
        Col.bigint("id"),
        Col.varchar("name_l1", 64).copy(collation = 8),   // latin1
        Col.varchar("name_u8", 64),                        // default utf8mb4
        Col.varchar("raw", 32).copy(collation = 63),       // VARBINARY
        Col.blob("body").copy(collation = 8)),             // latin1 TEXT
        columnCharsetTlv = columnCharsetTlv)
      val path = tmpLog()
      val w = new Writer(path, serverId = 5L)
      w.setClock(1700000000L); w.begin()
      w.tableMap(td)
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "café naïve ÀÿÑ", "café ✓ — 中",
        Array[Byte](0, -1, 42), "l'été à Genève")))
      w.xid(1L)
      w.close()
      val evs = parseFile(path)
      val tm = evs.collect { case t: TableMap => t }.head
      assert(tm.colCharsets(1) == 8 && tm.colCharsets(3) == 63 &&
        tm.colCharsets(4) == 8,
        s"charset TLV (columnCharsetTlv=$columnCharsetTlv) must bind " +
          s"per character column: ${tm.colCharsets}")
      val vals = rowsEvents(evs).head.rows.head._2.get.values.map(_.orNull)
      assert(vals(1) == "café naïve ÀÿÑ")
      assert(vals(2) == "café ✓ — 中")
      assert(java.util.Arrays.equals(vals(3).asInstanceOf[Array[Byte]],
        Array[Byte](0, -1, 42)), "binary collation surfaces bytes")
      assert(vals(4) == "l'été à Genève", "TEXT = BLOB + text collation")
    }
    run(columnCharsetTlv = false) // DEFAULT_CHARSET + overrides
    run(columnCharsetTlv = true)  // per-column COLUMN_CHARSET
    // the latin1 value must occupy latin1 BYTES on the wire (é etc. =
    // one byte) — prove the encode really used the charset, not UTF-8
    assert("café".getBytes(latin1).length == 4)
    // an unmapped collation must refuse at encode, naming the id
    val tdBad = TableDef(92L, "graft", "t", Seq(
      Col.bigint("id"), Col.varchar("s", 8).copy(collation = 99)))
    val w2 = new Writer(tmpLog(), serverId = 5L)
    w2.setClock(1700000000L); w2.begin()
    w2.tableMap(tdBad)
    intercept[RuntimeException] {
      w2.writeRows(tdBad, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "x")))
    }
    w2.close()
    // a value OUTSIDE the column's charset (em-dash into latin1) must
    // refuse, never ride the wire as the JVM's silent '?' substitution
    val tdL1 = TableDef(93L, "graft", "t", Seq(
      Col.bigint("id"), Col.varchar("s", 32).copy(collation = 8)))
    val w3 = new Writer(tmpLog(), serverId = 5L)
    w3.setClock(1700000000L); w3.begin()
    w3.tableMap(tdL1)
    val ex = intercept[IllegalArgumentException] {
      w3.writeRows(tdL1, Seq(Array[AnyRef](
        java.lang.Long.valueOf(1L), "em — dash")))
    }
    assert(ex.getMessage.contains("not representable"))
    w3.close()
  }

  test("TABLE_MAP carries 8.0 column names and signedness TLVs") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
    }
    val tm = evs.collect { case t: TableMap => t }.head
    assert(tm.schemaName == "graft" && tm.tableName == "ladder")
    assert(tm.colNames.get.toSeq == ladder.cols.map(_.name))
    // signedness covers numeric columns only; non-numerics default true
    val signed = tm.signedness.get
    assert(signed(1) && !signed(2), "tiny_u must decode as unsigned")
    assert(signed(12), "VARCHAR is not in the signedness bitmap")
  }

  test("nullable columns round-trip nulls (null bitmap, not absent)") {
    val path = tmpLog()
    val row = ladderRow(2L)
    row(12) = null; row(14) = null // vc, bl
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(row))
    }
    val img = rowsEvents(evs).head.rows.head._2.get
    assert(img.values(12).contains(null) && img.values(14).contains(null),
      "null bitmap: present-but-null, not absent")
    assert(img.values(0).contains(2L), "non-null neighbors unaffected")
  }

  test("UPDATE_ROWS v2 decodes before AND after images (two column bitmaps)") {
    val path = tmpLog()
    val before = ladderRow(3L)
    val after = ladderRow(3L)
    after(8) = java.lang.Double.valueOf(99.25)
    after(12) = "updated ''text''"
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder)
      w.updateRows(ladder, Seq((before, after)))
    }
    val re = rowsEvents(evs).head
    assert(re.eventType == UPDATE_ROWS_EVENT)
    val (b, a) = re.rows.head
    assert(b.get.values(8).contains(-2.718281828459045))
    assert(a.get.values(8).contains(99.25))
    assert(b.get.values(12).contains(ladderRow(3L)(12)))
    assert(a.get.values(12).contains("updated ''text''"))
  }

  test("DELETE_ROWS with a MINIMAL row image leaves absent columns None") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder)
      w.deleteRows(ladder, Seq(ladderRow(4L)), presentCols = Some(Set(0)))
    }
    val re = rowsEvents(evs).head
    assert(re.eventType == DELETE_ROWS_EVENT)
    val (b, a) = re.rows.head
    assert(a.isEmpty, "delete has no after image")
    val img = b.get
    assert(img.values(0).contains(4L), "the PK is present")
    assert(img.values.drop(1).forall(_.isEmpty),
      "binlog_row_image=MINIMAL: non-PK columns are absent, not null")
  }

  test("multi-row statements keep row order within one event") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder)
      w.writeRows(ladder, (10L to 14L).map(ladderRow))
    }
    val re = rowsEvents(evs).head
    assert(re.rows.map(_._2.get.values(0).get) == (10L to 14L))
  }

  test("ROTATE decodes position and successor file name") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
      w.rotate("binlog.000042", position = 4L)
    }
    val rot = evs.collect { case r: Rotate => r }.head
    assert(rot.position == 4L && rot.nextFile == "binlog.000042")
  }

  test("GTID events decode uuid:gno and fold into the executed-set string") {
    val path = tmpLog()
    val u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0000"
    val evs = writeLadder(path) { w =>
      // u1 txns 1,2 then a gap then 4; u2 a single txn — the shape
      // SHOW MASTER STATUS renders as "u1:1-2:4,u2:7"
      Seq(1L, 2L, 4L).foreach { gno =>
        w.gtid(u1, gno)
        w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(gno)))
        w.xid(gno)
      }
      w.gtid(u2, 7L)
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(7L)))
      w.xid(7L)
    }
    val gtids = evs.collect { case g: Gtid => g }
    assert(gtids.map(g => (g.uuid, g.gno)) ==
      Seq((u1, 1L), (u1, 2L), (u1, 4L), (u2, 7L)))
    assert(gtids.forall(_.flags == 1))
    assert(gtidSet(evs) == s"$u1:1-2:4,$u2:7")
    // row decoding is untouched by the interleaved GTID events
    assert(rowsEvents(evs).size == 4)
  }

  test("PREVIOUS_GTIDS decodes the executed set with closed-interval rendering") {
    val path = tmpLog()
    val u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0000"
    val evs = writeLadder(path) { w =>
      w.previousGtids(Seq(
        u1 -> Seq((1L, 5L), (7L, 7L)),
        u2 -> Seq((1L, 1L))))
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
    }
    val pg = evs.collect { case p: PreviousGtids => p }.head
    assert(pg.set == s"$u1:1-5:7,$u2:1",
      "wire end-exclusive intervals must render closed, singletons bare")
    assert(rowsEvents(evs).nonEmpty)
  }

  test("checksum-off logs parse (FDE reports ChecksumOff) and values match") {
    val path = tmpLog()
    val evs = writeLadder(path, checksum = false) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(9L)))
    }
    val fde = evs.collect { case f: FormatDescription => f }.head
    assert(fde.checksumAlg == ChecksumOff)
    assert(rowsEvents(evs).head.rows.head._2.get.values(0).contains(9L))
  }

  test("a corrupted checksummed event is refused loudly, never mis-decoded") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    bytes(bytes.length - 10) = (bytes(bytes.length - 10) ^ 0x5a).toByte
    val ex = intercept[BinlogFormatException](parse(bytes))
    assert(ex.getMessage.contains("CRC32 mismatch"))
  }

  test("a partial trailing event (writer mid-append) is dropped, not decoded") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.tableMap(ladder)
      w.writeRows(ladder, Seq(ladderRow(1L)))
      w.tableMap(ladder)
      w.writeRows(ladder, Seq(ladderRow(2L)))
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    val whole = parse(bytes)
    val lastSize = whole.last.header.eventSize
    val truncated = parse(java.util.Arrays.copyOf(bytes, bytes.length - lastSize / 2))
    assert(rowsEvents(truncated).map(_.rows.head._2.get.values(0).get) == Seq(1L))
  }

  test("v1 rows events (5.1 format) are refused by name, not mis-parsed") {
    val path = tmpLog()
    writeLadder(path, checksum = false) { w => w.tableMap(ladder) }
    val base = Files.readAllBytes(Paths.get(path))
    // hand-build a v1 WRITE_ROWS header (type 23) with an empty body
    val size = CommonHeaderLen
    val hdr = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(1700000000).put(WRITE_ROWS_V1.toByte).putInt(5)
      .putInt(size).putInt(base.length + size).putShort(0)
    val bytes = java.util.Arrays.copyOf(base, base.length + size)
    System.arraycopy(hdr.array(), 0, bytes, base.length, size)
    val ex = intercept[BinlogFormatException](parse(bytes))
    assert(ex.getMessage.contains("v1 rows events"))
  }

  test("a rows event with no preceding TABLE_MAP in range is refused loudly") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    val all = parse(bytes)
    val rows = rowsEvents(all).head
    val fde = all.collect { case f: FormatDescription => f }.head
    // resume INSIDE the event group: at the rows event, past its TABLE_MAP
    val tail = java.util.Arrays.copyOfRange(bytes, rows.startPos.toInt, bytes.length)
    val ex = intercept[BinlogFormatException](
      parse(tail, base = rows.startPos, fde = Some(fde)))
    assert(ex.getMessage.contains("no preceding TABLE_MAP"))
  }

  test("mid-file resume at a safe boundary decodes the identical suffix") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L))); w.xid(1L)
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(2L))); w.xid(2L)
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    val all = parse(bytes)
    val fde = all.collect { case f: FormatDescription => f }.head
    // boundary: start of the second group's TABLE_MAP
    val secondTm = all.collect { case t: TableMap => t }.apply(1)
    val tail = java.util.Arrays.copyOfRange(
      bytes, secondTm.startPos.toInt, bytes.length)
    val resumed = parse(tail, base = secondTm.startPos, fde = Some(fde))
    assert(rowsEvents(resumed).map(_.rows.head._2.get.values(0).get) == Seq(2L))
    assert(resumed.collect { case x: Xid => x.xid } == Vector(2L))
  }

  test("changeEvents projects insert/update/delete with keys, order and JSON") {
    val path = tmpLog()
    val td = TableDef(9L, "graft", "t", Seq(
      Col.bigint("k"), Col.varchar("v", 64), Col.double("x")))
    def row(k: Long, v: String, x: Double) = Array[AnyRef](
      java.lang.Long.valueOf(k), v, java.lang.Double.valueOf(x))
    val evs = writeLadder(path) { w =>
      w.tableMap(td); w.writeRows(td, Seq(row(1L, "a \"q\"", 1.5), row(2L, "b", 2.0)))
      w.xid(1L)
      w.tableMap(td); w.updateRows(td, Seq((row(1L, "a \"q\"", 1.5), row(1L, "a2", 9.0))))
      w.xid(2L)
      w.tableMap(td)
      w.deleteRows(td, Seq(row(2L, null, 0.0)), presentCols = Some(Set(0)))
      w.xid(3L)
    }
    val ces = changeEvents(evs)
    assert(ces.map(_.op) == Seq("insert", "insert", "update", "delete"))
    assert(ces.map(_.key) == Seq(1L, 2L, 1L, 2L))
    assert(ces.map(_.seq) == ces.map(_.seq).sorted, "seq is monotone in log order")
    assert(ces.map(_.seq).distinct.size == 4,
      "rows within one event get distinct seq values")
    assert(ces(0).payload == """{"k":1,"v":"a \"q\"","x":1.5}""",
      "payload uses TABLE_MAP column names and JSON-escapes quotes")
    assert(ces(2).payload == """{"k":1,"v":"a2","x":9.0}""",
      "update projects the AFTER image")
    assert(ces(3).payload == null, "delete is a tombstone: no payload")
    // the delta-consumer surface: before images ride payloadBefore
    assert(ces(0).payloadBefore == null && ces(1).payloadBefore == null,
      "inserts have no before image")
    assert(ces(2).payloadBefore == """{"k":1,"v":"a \"q\"","x":1.5}""",
      "update carries the full before image for retraction")
    assert(ces(3).payloadBefore == """{"k":2}""",
      "delete carries whatever before image the log had (PK-only here)")
  }

  test("advance() admits only whole events and never splits TABLE_MAP from rows") {
    val path = tmpLog()
    val td = TableDef(9L, "graft", "t", Seq(Col.bigint("k")))
    writeLadder(path) { w =>
      (1L to 3L).foreach { i =>
        w.tableMap(td)
        w.writeRows(td, Seq(Array[AnyRef](java.lang.Long.valueOf(i))))
        w.xid(i)
      }
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    val all = parse(bytes)
    val tmStarts = all.collect { case t: TableMap => t }.map(_.startPos).toSet
    // pace one row event per trigger; every offset must be a real event
    // boundary that is NOT the gap between a TABLE_MAP and its rows
    var off = 4L
    var seen = Vector.empty[Long]
    var guard = 0
    while (off < bytes.length && guard < 100) {
      val next = MysqlBinlogSource.advance(path, off, maxEvents = 1L).safe
      assert(next > off, s"advance must make progress from $off")
      assert(all.exists(_.header.nextPos == next),
        s"boundary $next must be a real event end")
      assert(!all.exists(e => tmStarts.contains(e.startPos) &&
        e.header.nextPos == next),
        s"boundary $next directly after a TABLE_MAP would orphan its rows")
      // the admitted range must parse standalone
      val fde = all.collect { case f: FormatDescription => f }.head
      val range = java.util.Arrays.copyOfRange(bytes, off.toInt, next.toInt)
      parse(range, base = off, fde = Some(fde)) // must not throw
      seen :+= next
      off = next
      guard += 1
    }
    assert(off == bytes.length, "pacing walks to exactly the file end")
    assert(seen.size >= 3, "one row event per trigger needs >= 3 triggers")
    // a partial tail is never admitted. Truncating the final XID by 3
    // bytes leaves txn 3 fence-less: txn-atomic admission (the default)
    // stops at txn 2's commit — the mid-commit rows must not surface
    // torn — while event-granular admission (txnAtomic=false) admits
    // every whole event.
    val cut = Files.createTempFile("graft_binlog_cut_", ".binlog")
    Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 3))
    val whole = parse(java.util.Arrays.copyOf(bytes, bytes.length - 3))
    val lastFence = whole.collect { case x: Xid => x }.last.header.nextPos
    assert(MysqlBinlogSource.advance(cut.toString, 4L, Long.MaxValue).safe
      == lastFence)
    assert(MysqlBinlogSource.advance(cut.toString, 4L, Long.MaxValue,
      txnAtomic = false).safe == whole.last.header.nextPos)
  }
  test("GTID set algebra: parse, containment, subset") {
    val u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0000"
    val set = parseGtidSet(s"$u1:1-5:7, $u2:3")
    assert(set(u1) == Vector((1L, 5L), (7L, 7L)))
    assert(set(u2) == Vector((3L, 3L)))
    assert(parseGtidSet("") == Map.empty && parseGtidSet(null) == Map.empty)
    Seq(1L, 5L, 7L).foreach(g => assert(gtidContains(set, u1, g)))
    Seq(0L, 6L, 8L).foreach(g => assert(!gtidContains(set, u1, g)))
    assert(gtidContains(set, u1.toUpperCase, 3L), "uuid match is case-blind")
    assert(!gtidContains(set, u2, 1L))
    // subset: interval-wise containment, missing uuid = not contained
    assert(gtidSubset(parseGtidSet(s"$u1:2-4"), set))
    assert(gtidSubset(Map.empty, set) && gtidSubset(set, set))
    assert(!gtidSubset(parseGtidSet(s"$u1:4-6"), set))
    assert(!gtidSubset(parseGtidSet(s"$u2:3-4"), set))
    assert(!gtidSubset(parseGtidSet("11111111-2222-3333-4444-555555555555:1"), set))
    // malformed sets refuse loudly (the CLI guard rides on this)
    intercept[BinlogFormatException](parseGtidSet("not-a-set"))
    intercept[BinlogFormatException](parseGtidSet(s"$u1:5-2"))
    intercept[BinlogFormatException](parseGtidSet(s"$u1:1-3:2-5"))
    intercept[BinlogFormatException](parseGtidSet(s"$u1"))
    // non-numeric / dangling gnos refuse CLASSIFIED, naming the
    // fragment — not a raw NumberFormatException
    intercept[BinlogFormatException](parseGtidSet(s"$u1:5-"))
    intercept[BinlogFormatException](parseGtidSet(s"$u1:x"))
  }

  test("QUERY events round-trip schema and statement text") {
    val path = tmpLog()
    val evs = writeLadder(path) { w =>
      w.query("graft", "BEGIN")
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L)))
    }
    val q = evs.collect { case q: Query => q }.head
    assert(q.schema == "graft" && q.query == "BEGIN")
    assert(rowsEvents(evs).nonEmpty)
  }

  test("decodeRows=false surfaces rows events as Opaque with verified headers") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", 1L)
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L))); w.xid(1L)
    }
    val evs = parse(Files.readAllBytes(Paths.get(path)), decodeRows = false)
    assert(evs.collect { case r: RowsEvent => r }.isEmpty)
    assert(evs.exists(e => e.isInstanceOf[Opaque] &&
      e.header.eventType == WRITE_ROWS_EVENT))
    // GTIDs still decode — that's what the auto-position scan reads
    assert(evs.collect { case g: Gtid => g }.map(_.gno) == Vector(1L))
  }

  test("GTID auto-position: skips executed transactions, follows rotation, parks when drained") {
    val dir = Files.createTempDirectory("graft_gtid_pos_").toString
    val u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val log1 = s"$dir/bin.000001"; val log2 = s"$dir/bin.000002"
    val w1 = new Writer(log1, serverId = 5L)
    w1.setClock(1700000000L); w1.begin()
    w1.previousGtids(Seq.empty)
    var gtidPos = Map.empty[Long, (String, Long)]
    Seq(1L, 2L).foreach { gno =>
      gtidPos += gno -> (log1, w1.position)
      w1.gtid(u, gno); w1.query("graft", "BEGIN")
      w1.tableMap(ladder); w1.writeRows(ladder, Seq(ladderRow(gno))); w1.xid(gno)
    }
    w1.rotate("bin.000002"); w1.close()
    val w2 = new Writer(log2, serverId = 5L)
    w2.setClock(1700000100L); w2.begin()
    w2.previousGtids(Seq(u -> Seq((1L, 2L))))
    Seq(3L, 4L).foreach { gno =>
      gtidPos += gno -> (log2, w2.position)
      w2.gtid(u, gno); w2.query("graft", "BEGIN")
      w2.tableMap(ladder); w2.writeRows(ladder, Seq(ladderRow(gno))); w2.xid(gno)
    }
    w2.close()
    // mid-file: first unexecuted txn within the head file
    val at2 = MysqlBinlogSource.positionAfterGtids(log1, s"$u:1")
    assert((at2.file, at2.bytes) == gtidPos(2L))
    assert(at2.effectiveEpoch == 1L)
    // across rotation: the whole head file is executed
    val at3 = MysqlBinlogSource.positionAfterGtids(log1, s"$u:1-2")
    assert((at3.file, at3.bytes) == gtidPos(3L))
    assert(at3.effectiveEpoch == 2L, "epoch accumulates across the followed rotation")
    val at4 = MysqlBinlogSource.positionAfterGtids(log1, s"$u:1-3")
    assert((at4.file, at4.bytes) == gtidPos(4L))
    // everything executed: park at the live tail's EOF
    val park = MysqlBinlogSource.positionAfterGtids(log1, s"$u:1-4")
    assert(park.file == log2 && park.bytes == Files.size(Paths.get(log2)))
    // purged history: log2's PREVIOUS_GTIDS (u:1-2) is not contained in
    // the requested set, so the needed history predates this chain
    val ex = intercept[IllegalStateException](
      MysqlBinlogSource.positionAfterGtids(log2, s"$u:1"))
    assert(ex.getMessage.contains("purged"))
  }

  test("GTID auto-position refuses anonymous transactions") {
    val path = tmpLog()
    writeLadder(path) { w =>
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L))); w.xid(1L)
    }
    val ex = intercept[IllegalStateException](
      MysqlBinlogSource.positionAfterGtids(path,
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:1"))
    assert(ex.getMessage.contains("no GTID"))
    // the refusal must not be absorbed by a PRECEDING executed
    // transaction: classification resets at each XID, so an anonymous
    // txn after an executed one still refuses (ON_PERMISSIVE logs)
    val u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val path2 = tmpLog()
    writeLadder(path2) { w =>
      w.gtid(u, 1L)
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L))); w.xid(1L)
      // anonymous transaction (no GTID) — must be refused, not skipped
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(2L))); w.xid(2L)
    }
    val ex2 = intercept[IllegalStateException](
      MysqlBinlogSource.positionAfterGtids(path2, s"$u:1"))
    assert(ex2.getMessage.contains("no GTID"))
    // a QUERY-terminated transaction (DDL — no XID on the wire) must
    // not leak its classification over the following anonymous txn
    // either; BEGIN, which sits between a GTID and its rows, must
    val path3 = tmpLog()
    writeLadder(path3) { w =>
      w.gtid(u, 1L)
      w.query("graft", "CREATE TABLE t2 (id INT)") // DDL txn, no XID
      w.gtid(u, 2L)
      w.query("graft", "BEGIN") // BEGIN must NOT reset txn 2's class
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(1L))); w.xid(1L)
      // anonymous transaction after the executed ones: refuse
      w.tableMap(ladder); w.writeRows(ladder, Seq(ladderRow(2L))); w.xid(2L)
    }
    val ex3 = intercept[IllegalStateException](
      MysqlBinlogSource.positionAfterGtids(path3, s"$u:1-2"))
    assert(ex3.getMessage.contains("no GTID"))
  }
  test("JSON columns round-trip text through the binary document format") {
    val path = tmpLog()
    val jt = TableDef(8L, "graft", "j", Seq(
      Col.bigint("id"), Col.json("doc")))
    val docs = Seq(
      """{"k":69}""",
      """{"a":[1,2,3],"b":{"c":"x","d":null},"e":true,"f":false}""",
      """[]""", """{}""", """null""", """true""", """-32768""",
      """32768""", """-2147483649""", """9007199254740993""",
      """3.5""", """"just a string"""",
      """{"nested":{"deep":[{"x":1},{"y":[[],{}]}]}}""",
      """{"uni":"naïve ✓ \"q\" \n tab\t"}""")
    val evs = writeLadder(path) { w =>
      w.tableMap(jt)
      w.writeRows(jt, docs.zipWithIndex.map { case (d, i) =>
        Array[AnyRef](java.lang.Long.valueOf(i.toLong), d)
      })
    }
    val got = rowsEvents(evs).head.rows.map(_._2.get.values(1).get)
    // canonical text: compact, stored order — input chosen pre-canonical
    assert(got.map(_.asInstanceOf[String]) == docs,
      s"JSON docs must round-trip text-exactly")
    // whitespace canonicalizes away; int/double distinction survives
    val path2 = tmpLog()
    val evs2 = writeLadder(path2) { w =>
      w.tableMap(jt)
      w.writeRows(jt, Seq(Array[AnyRef](java.lang.Long.valueOf(1L),
        """{ "k" : 69 , "v" : 5.0 }""")))
    }
    assert(rowsEvents(evs2).head.rows.head._2.get.values(1).get ==
      """{"k":69,"v":5.0}""")
  }

  test("fuzz: random JSON trees round-trip the binary document (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    import MysqlJsonBinary._
    def gen(depth: Int): JVal = rnd.nextInt(if (depth > 3) 7 else 9) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JInt(rnd.nextInt(200000) - 100000L)
      case 3 => JInt(rnd.nextLong())
      case 4 => JDouble(rnd.nextDouble() * 1e6 - 5e5)
      case 5 => JStr(rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
        (if (rnd.nextBoolean()) "\"\\naïve\n" else ""))
      case 6 => JInt(rnd.nextInt(70000).toLong - 35000L)
      case 7 => JArr(Vector.fill(rnd.nextInt(6))(gen(depth + 1)))
      case 8 => JObj(Vector.tabulate(rnd.nextInt(6))(i =>
        s"k${i}_${rnd.nextInt(100)}" -> gen(depth + 1)))
    }
    (1 to 300).foreach { i =>
      val v = gen(0)
      val text = render(v)
      val decoded = decode(encode(text))
      assert(decoded == text, s"fuzz case $i: $text != $decoded")
    }
  }

  test("JSON large containers (4-byte offsets) decode; opaque types refuse") {
    import MysqlJsonBinary._
    // a value pushing the container past 64 KiB forces the LARGE form
    val big = "x" * 70000
    val text = s"""{"small":1,"big":"$big","tail":[1,2]}"""
    assert(decode(encode(text)) == text)
    val arr = "[" + (s""""$big",""") + "2,3]"
    assert(decode(encode(arr)) == arr)
    // opaque/unsupported type byte refuses loudly
    val ex = intercept[JsonBinaryException](decode(Array(0x0f.toByte, 0x00)))
    assert(ex.getMessage.contains("unsupported"))
    // a TRUNCATED doc (valid type byte, payload too short for it) is a
    // classified refusal too, not a raw IndexOutOfBoundsException
    intercept[JsonBinaryException](decode(Array(0x07.toByte, 0x01.toByte)))
    intercept[JsonBinaryException](
      decode(encode("""{"k":[1,2,3]}""").dropRight(4)))
    // zero-length document (server-side NULL context) decodes to null
    assert(decode(Array.emptyByteArray) == "null")
  }
  test("MINIMAL update images: separate before/after bitmaps, key fallback") {
    val path = tmpLog()
    val td = TableDef(9L, "graft", "m", Seq(
      Col.bigint("id"), Col.varchar("name", 64), Col.double("score")))
    val evs = writeLadder(path) { w =>
      w.tableMap(td)
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(7L), "alice", java.lang.Double.valueOf(1.5))))
      // binlog_row_image=MINIMAL: before = PK only, after = changed col
      w.tableMap(td)
      w.updateRows(td,
        Seq((Array[AnyRef](java.lang.Long.valueOf(7L), null, null),
             Array[AnyRef](null, null, java.lang.Double.valueOf(9.5)))),
        beforePresent = Some(Set(0)), afterPresent = Some(Set(2)))
    }
    val upd = rowsEvents(evs).last.rows.head
    val (before, after) = (upd._1.get, upd._2.get)
    assert(before.values.toSeq == Seq(Some(7L), None, None),
      "before image carries exactly the PK")
    assert(after.values(0).isEmpty && after.values(1).isEmpty &&
      after.values(2).contains(9.5),
      "after image carries exactly the changed column")
    // changeEvents: key falls back to the before image's PK, payload is
    // the present columns of the decisive (after) image only
    val ces = changeEvents(evs)
    assert(ces.map(_.op) == Seq(ChangeEvent.Insert, ChangeEvent.Update))
    assert(ces.last.key == 7L)
    assert(ces.last.payload == """{"score":9.5}""")
    // an update whose NEITHER image carries the key still refuses loudly
    val path2 = tmpLog()
    val evs2 = writeLadder(path2) { w =>
      w.tableMap(td)
      w.updateRows(td,
        Seq((Array[AnyRef](null, "x", null),
             Array[AnyRef](null, "y", null))),
        beforePresent = Some(Set(1)), afterPresent = Some(Set(1)))
    }
    val ex = intercept[BinlogFormatException](changeEvents(evs2))
    assert(ex.getMessage.contains("key"))
  }
  test("corruption fuzz: byte flips refuse loudly or truncate, never crash") {
    // the decoder's contract under corruption: every flip either (a)
    // still parses (checksum-off logs can carry undetectably corrupt
    // VALUES — GIGO, no CRC to catch it), (b) truncates at a
    // partial-looking tail, or (c) throws BinlogFormatException. Never
    // an index error, negative/huge allocation, native-library
    // exception, or hang — a hostile byte must not take the tail down
    // with anything but this decoder's own loud refusal.
    val rng = new scala.util.Random(9191)
    def buildLog(checksum: Boolean, wrapped: Boolean): Array[Byte] = {
      val path = tmpLog()
      val w = new Writer(path, serverId = 5L, checksum = checksum)
      w.setClock(1700000000L); w.begin()
      val td = TableDef(66L, "graft", "t", Seq(
        Col.bigint("id"), Col.decimal("amt", 12, 4), Col.varchar("s", 64),
        Col.enumCol("e", Seq("a", "b", "c")), Col.time("t6", 6),
        Col.json("j")))
      val rows = (1 to 20).map(i => Array[AnyRef](
        java.lang.Long.valueOf(i.toLong), new java.math.BigDecimal("12.3400"),
        s"value-$i", "b", "01:02:03.000004", s"""{"k": $i}"""))
      if (wrapped)
        w.transactionPayload() { in =>
          in.tableMap(td); in.writeRows(td, rows); in.xid(1L)
        }
      else { w.tableMap(td); w.writeRows(td, rows); w.xid(1L) }
      w.close()
      Files.readAllBytes(Paths.get(path))
    }
    for ((checksum, wrapped) <- Seq((true, false), (false, false),
        (true, true), (false, true))) {
      val clean = buildLog(checksum, wrapped)
      parse(clean) // sanity: the uncorrupted log parses
      for (iter <- 1 to 300) {
        val b = clean.clone()
        (0 until 1 + rng.nextInt(3)).foreach { _ =>
          val i = 4 + rng.nextInt(b.length - 4) // past the magic
          b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
        }
        try { parse(b); () }
        catch {
          case _: BinlogFormatException => ()
          case e: Throwable => fail(
            s"cs=$checksum wrap=$wrapped iter=$iter escaped the decoder: " +
              s"${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("NOBLOB images: full row minus unchanged blobs, payload intact") {
    val path = tmpLog()
    val td = TableDef(11L, "graft", "nb", Seq(
      Col.bigint("id"), Col.varchar("name", 64), Col.blob("doc")))
    val doc = "blob-body".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val evs = writeLadder(path) { w =>
      w.tableMap(td)
      w.writeRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(3L), "carol", doc))) // insert: full image
      // binlog_row_image=NOBLOB, blob UNCHANGED: both images full
      // minus the blob column
      w.tableMap(td)
      w.updateRows(td,
        Seq((Array[AnyRef](java.lang.Long.valueOf(3L), "carol", null),
             Array[AnyRef](java.lang.Long.valueOf(3L), "carla", null))),
        beforePresent = Some(Set(0, 1)), afterPresent = Some(Set(0, 1)))
      // NOBLOB delete: full before image minus the blob — NOT PK-only
      w.tableMap(td)
      w.deleteRows(td, Seq(Array[AnyRef](
        java.lang.Long.valueOf(3L), "carla", null)),
        presentCols = Some(Set(0, 1)))
    }
    val res = rowsEvents(evs)
    val upd = res(1).rows.head
    assert(upd._1.get.values.toSeq == Seq(Some(3L), Some("carol"), None),
      "NOBLOB before image: all non-blob columns, blob absent")
    assert(upd._2.get.values.toSeq == Seq(Some(3L), Some("carla"), None))
    val del = res(2).rows.head
    assert(del._1.get.values.toSeq == Seq(Some(3L), Some("carla"), None),
      "NOBLOB delete image: full minus blob, not PK-only")
    val ces = changeEvents(evs)
    assert(ces.map(_.op) == Seq(
      ChangeEvent.Insert, ChangeEvent.Update, ChangeEvent.Delete))
    assert(ces(0).payload.contains("\"doc\""),
      "insert payload still carries the blob (the statement set it)")
    assert(ces(1).key == 3L &&
      ces(1).payload == """{"id":3,"name":"carla"}""",
      "update payload = present (non-blob) columns only")
  }

  test("TRANSACTION_PAYLOAD (zstd) round-trips a wrapped transaction") {
    val path = tmpLog()
    val td = TableDef(13L, "graft", "tp", Seq(
      Col.bigint("id"), Col.varchar("v", 64)))
    def row(id: Long, v: String) = Array[AnyRef](
      java.lang.Long.valueOf(id), v: AnyRef)
    val evs = writeLadder(path) { w =>
      w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", 1L)
      w.transactionPayload() { inner =>
        inner.query("graft", "BEGIN")
        inner.tableMap(td)
        inner.writeRows(td, Seq(row(1L, "a"), row(2L, "b")))
        inner.tableMap(td)
        inner.updateRows(td, Seq((row(1L, "a"), row(1L, "a2"))))
        inner.xid(1L)
      }
      // a plain transaction AFTER the wrapper: ordering must hold
      w.tableMap(td); w.writeRows(td, Seq(row(3L, "c"))); w.xid(2L)
    }
    // the wrapper is unwrapped in place: inner Query/TableMap/Rows/Xid
    // appear in the stream, and the GTID decoded before it
    assert(evs.collect { case q: Query => q.query } == Vector("BEGIN"))
    val res = rowsEvents(evs)
    assert(res.map(_.eventType) ==
      Seq(WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, WRITE_ROWS_EVENT))
    assert(res(0).rows.map(_._2.get.values(1).get) == Seq("a", "b"))
    assert(res(1).rows.head._2.get.values(1).contains("a2"))
    // changeEvents: inner rows share the wrapper position but keep a
    // total seq order, all strictly before the next transaction's rows
    val ces = changeEvents(evs)
    assert(ces.map(_.op) == Seq(ChangeEvent.Insert, ChangeEvent.Insert,
      ChangeEvent.Update, ChangeEvent.Insert))
    assert(ces.map(_.seq) == ces.map(_.seq).sorted)
    assert(ces.map(_.seq).distinct.size == 4)
    assert(ces.take(3).map(_.key) == Seq(1L, 2L, 1L))
    // zstd actually engaged: the wrapper is smaller than its content
    val wrapped = Files.readAllBytes(Paths.get(path))
    // uncompressed variant decodes identically
    val path2 = tmpLog()
    val evs2 = writeLadder(path2) { w =>
      w.transactionPayload(compress = false) { inner =>
        inner.tableMap(td)
        inner.writeRows(td, Seq(row(9L, "z")))
        inner.xid(1L)
      }
    }
    assert(rowsEvents(evs2).head.rows.head._2.get.values(0).contains(9L))
    assert(wrapped.nonEmpty)
    // wire conformance of the NONE header: the compression-type TLV's
    // declared length must be net_length_size(255) = 3 (a consumer that
    // skips fields BY LENGTH — as MySQL's codec does — would misparse a
    // declared 1)
    val raw2 = Files.readAllBytes(Paths.get(path2))
    var off = 4
    var tpBody = -1
    while (tpBody < 0 && off + CommonHeaderLen <= raw2.length) {
      val size = (raw2(off + 9) & 0xff) | ((raw2(off + 10) & 0xff) << 8) |
        ((raw2(off + 11) & 0xff) << 16) | ((raw2(off + 12) & 0xff) << 24)
      if ((raw2(off + 4) & 0xff) == TRANSACTION_PAYLOAD_EVENT)
        tpBody = off + CommonHeaderLen
      else off += size
    }
    assert(tpBody > 0, "TRANSACTION_PAYLOAD event not found")
    assert((raw2(tpBody) & 0xff) == 2, "first TLV field is compression type")
    assert((raw2(tpBody + 1) & 0xff) == 3,
      "NONE (255) declares its 3-byte lenenc width")
    assert((raw2(tpBody + 2) & 0xff) == 0xfc &&
      (raw2(tpBody + 3) & 0xff) == 0xff && (raw2(tpBody + 4) & 0xff) == 0x00)
  }

  test("a corrupted TRANSACTION_PAYLOAD is refused by the wrapper CRC") {
    val path = tmpLog()
    val td = TableDef(13L, "graft", "tp", Seq(Col.bigint("id")))
    writeLadder(path) { w =>
      w.transactionPayload() { inner =>
        inner.tableMap(td)
        inner.writeRows(td, Seq(Array[AnyRef](java.lang.Long.valueOf(1L))))
        inner.xid(1L)
      }
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    bytes(bytes.length - 20) = (bytes(bytes.length - 20) ^ 0x3c).toByte
    val ex = intercept[BinlogFormatException](parse(bytes))
    assert(ex.getMessage.contains("CRC32") || ex.getMessage.contains("zstd"))
  }

  test("ROWS_QUERY provenance round-trips, including past the legacy length byte") {
    val path = tmpLog()
    val td = TableDef(9L, "graft", "t", Seq(Col.bigint("k")))
    val longSql = "INSERT INTO t /* " + ("x" * 400) + " */ VALUES (1)"
    val evs = writeLadder(path) { w =>
      w.rowsQuery(longSql)
      w.tableMap(td)
      w.writeRows(td, Seq(Array[AnyRef](java.lang.Long.valueOf(1L))))
      w.xid(1L)
    }
    val rq = evs.collect { case r: RowsQuery => r }
    assert(rq.map(_.query) == Seq(longSql),
      "the FULL text must survive even though the length byte saturates at 255")
    // provenance is audit-only: the change projection ignores it
    assert(changeEvents(evs).map(_.op) == Seq("insert"))
  }

  // -- PARTIAL_JSON (binlog_row_value_options, WL#2955) ----------------

  test("JSON diff apply matches the server's documented semantics") {
    import MysqlJsonBinary._
    import MysqlJsonDiff._
    def j(s: String): JVal = parseText(s)
    def applyText(doc: String, ds: Diff*): String =
      render(MysqlJsonDiff.apply(j(doc), ds))
    // REPLACE a member / an array cell / a nested scalar
    assert(applyText("""{"a":1,"b":2}""",
      Diff(OpReplace, "$.a", Some(j("9")))) == """{"a":9,"b":2}""")
    assert(applyText("""[1,2,3]""",
      Diff(OpReplace, "$[1]", Some(j(""""x"""")))) == """[1,"x",3]""")
    assert(applyText("""{"a":{"b":[0,{"c":1}]}}""",
      Diff(OpReplace, "$.a.b[1].c", Some(j("true")))) ==
      """{"a":{"b":[0,{"c":true}]}}""")
    // REPLACE at '$' swaps the whole document
    assert(applyText("""{"a":1}""",
      Diff(OpReplace, "$", Some(j("[1]")))) == "[1]")
    // INSERT appends a new member in arrival order (stored order IS
    // rendered order in the binary format)
    assert(applyText("""{"a":1}""",
      Diff(OpInsert, "$.z", Some(j("2"))),
      Diff(OpInsert, "$.m", Some(j("3")))) == """{"a":1,"z":2,"m":3}""")
    // INSERT splices an array cell; past-the-end appends (JSON_ARRAY_INSERT)
    assert(applyText("""{"a":[1,3]}""",
      Diff(OpInsert, "$.a[1]", Some(j("2")))) == """{"a":[1,2,3]}""")
    assert(applyText("""{"a":[1]}""",
      Diff(OpInsert, "$.a[99]", Some(j("2")))) == """{"a":[1,2]}""")
    // REMOVE a member / a cell
    assert(applyText("""{"a":1,"b":2}""",
      Diff(OpRemove, "$.a", None)) == """{"b":2}""")
    assert(applyText("""[1,2,3]""", Diff(OpRemove, "$[0]", None)) == "[2,3]")
    // diffs apply in log order, later diffs see earlier effects
    assert(applyText("""{"n":0,"tags":[]}""",
      Diff(OpReplace, "$.n", Some(j("1"))),
      Diff(OpInsert, "$.tags[0]", Some(j(""""a""""))),
      Diff(OpInsert, "$.tags[1]", Some(j(""""b""""))),
      Diff(OpRemove, "$.tags[0]", None)) == """{"n":1,"tags":["b"]}""")
    // strictness: a diff that does not fit the document shape refuses
    intercept[JsonDiffException](applyText("""{"a":1}""",
      Diff(OpReplace, "$.b", Some(j("1")))))
    intercept[JsonDiffException](applyText("""{"a":1}""",
      Diff(OpInsert, "$.a", Some(j("1"))))) // member already present
    intercept[JsonDiffException](applyText("""{"a":1}""",
      Diff(OpRemove, "$.b", None)))
    intercept[JsonDiffException](applyText("""[1]""",
      Diff(OpReplace, "$[5]", Some(j("1")))))
    intercept[JsonDiffException](applyText("""{"a":1}""",
      Diff(OpRemove, "$", None))) // REMOVE at root is never logged
    intercept[JsonDiffException](applyText("""{"a":1}""",
      Diff(OpReplace, "$.a.b", Some(j("1"))))) // descends into a scalar
  }

  test("JSON diff paths: quoted keys and array cells parse; junk refuses") {
    import MysqlJsonDiff._
    assert(parsePath("$") == Vector())
    assert(parsePath("$.a.b[3].c") ==
      Vector(Member("a"), Member("b"), Cell(3), Member("c")))
    assert(parsePath("""$."key with spaces"[0]""") ==
      Vector(Member("key with spaces"), Cell(0)))
    assert(parsePath("""$."quo\"te"""") == Vector(Member("quo\"te")))
    // renderPath round-trips, quoting only when needed
    val legs = Vector(Member("plain"), Cell(2), Member("needs quoting"))
    assert(parsePath(renderPath(legs)) == legs)
    intercept[JsonDiffException](parsePath("a.b"))   // no '$'
    intercept[JsonDiffException](parsePath("$.a[*]")) // wildcard never logged
    intercept[JsonDiffException](parsePath("$.a["))
    intercept[JsonDiffException](parsePath("$."))
    intercept[JsonDiffException](parsePath("$[last]"))
  }

  test("fuzz: diff vectors round-trip the wire codec (seeded)") {
    import MysqlJsonBinary._
    import MysqlJsonDiff._
    val rnd = new scala.util.Random(20260815L)
    def genVal(depth: Int): JVal = rnd.nextInt(if (depth > 2) 5 else 7) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JInt(rnd.nextLong() >> rnd.nextInt(48))
      case 3 => JDouble(rnd.nextDouble() * 1e4)
      case 4 => JStr(rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
      case 5 => JArr(Vector.fill(rnd.nextInt(4))(genVal(depth + 1)))
      case 6 => JObj(Vector.tabulate(rnd.nextInt(4))(i =>
        s"k$i" -> genVal(depth + 1)))
    }
    def genPath(): String = "$" + (0 until rnd.nextInt(4)).map { _ =>
      if (rnd.nextBoolean()) s".m${rnd.nextInt(100)}"
      else s"[${rnd.nextInt(100)}]"
    }.mkString
    (1 to 200).foreach { i =>
      val diffs = Vector.fill(rnd.nextInt(6)) {
        val op = rnd.nextInt(3)
        Diff(op, genPath(), if (op == OpRemove) None else Some(genVal(0)))
      }
      assert(MysqlJsonDiff.decode(MysqlJsonDiff.encode(diffs)) == diffs,
        s"fuzz case $i")
    }
    // corruption: truncations refuse loudly, never misparse
    val bytes = MysqlJsonDiff.encode(Seq(
      Diff(OpReplace, "$.a", Some(JInt(1))),
      Diff(OpRemove, "$.b", None)))
    (1 until bytes.length).foreach { cut =>
      try { MysqlJsonDiff.decode(bytes.take(cut)); () }
      catch { case _: JsonDiffException => () }
    }
    intercept[JsonDiffException](
      MysqlJsonDiff.decode(Array(7.toByte))) // unknown op
  }

  test("PARTIAL_UPDATE_ROWS reconstructs after images from diff vectors") {
    import MysqlJsonBinary._
    import MysqlJsonDiff._
    def j(s: String): JVal = parseText(s)
    val td = TableDef(11L, "graft", "pj", Seq(
      Col.bigint("id"), Col.json("doc"), Col.varchar("tag", 32),
      Col.json("aux")))
    val path = tmpLog()
    val before1 = Array[AnyRef](java.lang.Long.valueOf(1L),
      """{"n":0,"tags":["x"],"tmp":true}""", "t1", """{"v":1}""")
    val before2 = Array[AnyRef](java.lang.Long.valueOf(2L),
      """{"n":5}""", "t2", null)
    val evs = writeLadder(path) { w =>
      w.tableMap(td)
      w.partialUpdateRows(td, Seq(
        // row 1: doc patched (replace + insert + remove), aux patched
        // with the zero-length "unchanged" vector, tag rewritten
        (before1, Array[AnyRef](java.lang.Long.valueOf(1L),
          Diffs(Seq(
            Diff(OpReplace, "$.n", Some(j("7"))),
            Diff(OpInsert, "$.tags[1]", Some(j(""""y""""))),
            Diff(OpRemove, "$.tmp", None))),
          "t1b", Diffs(Nil))),
        // row 2: doc replaced IN FULL (bit clear — plain text value),
        // aux stays NULL through the null bitmap
        (before2, Array[AnyRef](java.lang.Long.valueOf(2L),
          """{"n":6}""", "t2", null))))
      w.xid(1L)
    }
    val re = rowsEvents(evs).head
    assert(re.eventType == PARTIAL_UPDATE_ROWS_EVENT)
    val Seq((b1, a1), (b2, a2)) = re.rows
    assert(b1.get.values(1).get == """{"n":0,"tags":["x"],"tmp":true}""")
    assert(a1.get.values(1).get == """{"n":7,"tags":["x","y"]}""",
      "diffs apply onto the before image")
    assert(a1.get.values(3).get == """{"v":1}""",
      "zero-length diff vector means unchanged")
    assert(a1.get.values(2).get == "t1b")
    assert(a2.get.values(1).get == """{"n":6}""",
      "a full JSON value rides beside partial columns with its bit clear")
    assert(a2.get.values(3).get == null)
    // downstream: a partial update is an ordinary update
    val ces = changeEvents(evs)
    assert(ces.map(_.op) == Seq("update", "update"))
    assert(ces.head.payload.contains(""""doc":"{\"n\":7,\"tags\":[\"x\",\"y\"]}""""))
  }

  test("MINIMAL × PARTIAL_JSON: absent before column defers; partial_bits spans after-image JSON columns only") {
    import MysqlJsonDiff._
    // MINIMAL before image (PK only): the log holds no document to
    // patch — the decoder surfaces a deferred base64 marker the
    // stateful consumer resolves, never a fabricated document
    val td = TableDef(13L, "graft", "pjm", Seq(
      Col.bigint("id"), Col.json("doc")))
    val p1 = tmpLog()
    val diffs = Seq(Diff(OpReplace, "$.a",
      Some(MysqlJsonBinary.JInt(2L))))
    val evs = writeLadder(p1) { w =>
      w.tableMap(td)
      w.partialUpdateRows(td, Seq((
        Array[AnyRef](java.lang.Long.valueOf(1L), null),
        Array[AnyRef](null, Diffs(diffs)))),
        beforePresent = Some(Set(0)), afterPresent = Some(Set(1)))
      w.xid(1L)
    }
    val (b, a) = rowsEvents(evs).head.rows.head
    assert(b.get.values(1).isEmpty, "before image is PK-only")
    val marker = a.get.values(1).get.asInstanceOf[String]
    val b64 = java.util.Base64.getEncoder
      .encodeToString(MysqlJsonDiff.encode(diffs))
    assert(marker == s"""{"__jsondiff":"$b64"}""",
      "deferred marker carries the raw vector for the stateful applier")
    // partial_bits DOMAIN pin (WL#2955: one bit per JSON column in the
    // AFTER IMAGE, not per JSON column of the table): 9 JSON columns,
    // after image carries 8 → the bitmap is ONE byte. Under the
    // per-table reading it would be two, the cursor would desync, and
    // the exact-consumption check would refuse the event — so this
    // decode SUCCEEDING pins the chosen interpretation byte-exactly on
    // both writer and parser.
    val td9 = TableDef(14L, "graft", "pj9", Seq(
      Col.bigint("id")) ++ (0 until 9).map(i => Col.json(s"j$i")))
    val p2 = tmpLog()
    val after9 = Array[AnyRef](java.lang.Long.valueOf(7L)) ++
      (0 until 8).map[AnyRef] { i =>
        if (i == 0) Diffs(Seq(Diff(OpReplace, "$.k",
          Some(MysqlJsonBinary.JInt(i.toLong)))))
        else s"""{"k":$i}"""
      }
    val evs9 = writeLadder(p2) { w =>
      w.tableMap(td9)
      w.partialUpdateRows(td9, Seq((
        Array[AnyRef](java.lang.Long.valueOf(7L)) ++
          Array.fill[AnyRef](9)(null),
        after9)),
        beforePresent = Some(Set(0)),
        afterPresent = Some((0 to 8).toSet)) // omits the 9th JSON col
      w.xid(1L)
    }
    val (_, a9) = rowsEvents(evs9).head.rows.head
    assert(a9.get.values(1).get.asInstanceOf[String]
      .startsWith("""{"__jsondiff":"""),
      "the flagged after-image JSON column defers (PK-only before)")
    assert(a9.get.values(2).get == """{"k":1}""")
    assert(a9.get.values(8).get == """{"k":7}""")
    assert(a9.get.values(9).isEmpty, "omitted JSON column stays absent")
  }

  test("partial JSON failures are loud: no before value, corrupt vector") {
    import MysqlJsonBinary._
    import MysqlJsonDiff._
    val td = TableDef(12L, "graft", "pj2", Seq(
      Col.bigint("id"), Col.json("doc")))
    // a NULL before image value cannot host a patch
    val p1 = tmpLog()
    intercept[BinlogFormatException] {
      writeLadder(p1) { w =>
        w.tableMap(td)
        w.partialUpdateRows(td, Seq((
          Array[AnyRef](java.lang.Long.valueOf(1L), null),
          Array[AnyRef](java.lang.Long.valueOf(1L),
            Diffs(Seq(Diff(OpReplace, "$.a", Some(JInt(1)))))))))
      }
    }
    // a diff disagreeing with the before image refuses as corrupt
    val p3 = tmpLog()
    intercept[BinlogFormatException] {
      writeLadder(p3) { w =>
        w.tableMap(td)
        w.partialUpdateRows(td, Seq((
          Array[AnyRef](java.lang.Long.valueOf(1L), """{"a":1}"""),
          Array[AnyRef](java.lang.Long.valueOf(1L),
            Diffs(Seq(Diff(OpRemove, "$.zzz", None)))))))
      }
    }
  }
}
