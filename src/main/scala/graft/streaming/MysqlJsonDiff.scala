package graft.streaming

import java.nio.charset.StandardCharsets

import MysqlJsonBinary._

/** MySQL 8.0 partial JSON updates (`binlog_row_value_options=
  * PARTIAL_JSON`, publicly specified by WL#2955 and the
  * `Json_diff_vector` serialization in `sql/log_event.cc` /
  * `sql/json_diff.h`): when an UPDATE modifies a JSON column only
  * through `JSON_SET`/`JSON_REPLACE`/`JSON_REMOVE`/`JSON_ARRAY_INSERT`,
  * the server logs a PARTIAL_UPDATE_ROWS_EVENT (type 39) whose after
  * image carries, for each flagged JSON column, a vector of diff
  * operations instead of the full document — on a wide JSON column a
  * few-byte patch replaces a re-log of the whole value, which is the
  * entire point at 100 TB log volume.
  *
  * Wire form of one diff (repeated until the column value's bytes are
  * exhausted):
  * {{{
  * operation    ::= 1 byte    (0=REPLACE, 1=INSERT, 2=REMOVE)
  * path-length  ::= lenenc    (mysql packet length-encoded int)
  * path         ::= utf8 bytes of a JSON path (member/array-cell legs
  *                  only — the optimizer never logs wildcards)
  * value-length ::= lenenc    (absent for REMOVE)
  * value        ::= a complete binary JSON document (MysqlJsonBinary)
  * }}}
  *
  * A ZERO-LENGTH diff vector means "column unchanged" — the server
  * writes it when the statement touched other columns of the row but
  * left this JSON column alone under FULL row images.
  *
  * Application semantics mirror the server's applier
  * (`Json_dom::apply_json_diff`): REPLACE requires the path to exist;
  * INSERT adds a new object member (error if present) or splices an
  * array cell (appending when the index is past the end, as
  * `JSON_ARRAY_INSERT` does); REMOVE requires the path to exist. Any
  * violation is a LOUD error — a diff that does not apply means the
  * before image and the log disagree, and continuing would silently
  * materialize a wrong row (the one thing the decode path promises
  * never to do, same contract as [[MysqlBinlog]]).
  */
object MysqlJsonDiff {

  val OpReplace = 0
  val OpInsert = 1
  val OpRemove = 2

  final class JsonDiffException(msg: String) extends RuntimeException(msg)

  /** One logged operation. `value` is None exactly for REMOVE. */
  final case class Diff(op: Int, path: String, value: Option[JVal]) {
    require(op >= OpReplace && op <= OpRemove, s"diff operation $op")
    require((op == OpRemove) == value.isEmpty,
      s"${opName(op)} diff ${if (value.isEmpty) "missing" else "carrying"} a value")
  }

  /** Writer-side marker: a row image cell of this type makes
    * [[MysqlBinlogWriter]] flag the column partial and encode the diff
    * vector instead of a full document. An EMPTY seq encodes the
    * zero-length "unchanged" form.
    */
  final case class Diffs(diffs: Seq[Diff])

  private def opName(op: Int): String = op match {
    case OpReplace => "REPLACE"
    case OpInsert => "INSERT"
    case OpRemove => "REMOVE"
    case o => s"op$o"
  }

  // -- JSON path (member / array-cell legs only) ------------------------
  sealed trait Leg
  final case class Member(key: String) extends Leg
  final case class Cell(idx: Int) extends Leg

  /** Parse `$`, `$.key`, `$."quoted key"`, `$[3]`, and nested
    * combinations. Wildcards / ranges / `last` are rejected: the server
    * never logs them in a diff path (WL#2955 — diffs address one
    * scalar/subtree each).
    */
  def parsePath(s: String): Vector[Leg] = {
    if (s.isEmpty || s.charAt(0) != '$')
      throw new JsonDiffException(s"JSON path must start with '$$': $s")
    val legs = Vector.newBuilder[Leg]
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          if (i >= s.length)
            throw new JsonDiffException(s"dangling '.' in path: $s")
          if (s.charAt(i) == '"') {
            // quoted member key, JSON-string escapes
            i += 1
            val b = new StringBuilder
            var closed = false
            while (!closed) {
              if (i >= s.length)
                throw new JsonDiffException(s"unterminated quoted key in path: $s")
              s.charAt(i) match {
                case '"' => closed = true; i += 1
                case '\\' =>
                  if (i + 1 >= s.length)
                    throw new JsonDiffException(s"dangling escape in path: $s")
                  s.charAt(i + 1) match {
                    case '"' => b += '"'
                    case '\\' => b += '\\'
                    case '/' => b += '/'
                    case 'n' => b += '\n'
                    case 't' => b += '\t'
                    case 'u' =>
                      if (i + 5 >= s.length)
                        throw new JsonDiffException(s"short \\u escape in path: $s")
                      b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
                      i += 4
                    case c =>
                      throw new JsonDiffException(s"bad path escape \\$c in: $s")
                  }
                  i += 2
                case c => b += c; i += 1
              }
            }
            legs += Member(b.result())
          } else {
            val start = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit ||
              s.charAt(i) == '_')) i += 1
            if (i == start)
              throw new JsonDiffException(
                s"empty member name at offset $start in path: $s")
            legs += Member(s.substring(start, i))
          }
        case '[' =>
          i += 1
          val start = i
          while (i < s.length && s.charAt(i).isDigit) i += 1
          if (i == start || i >= s.length || s.charAt(i) != ']')
            throw new JsonDiffException(
              s"bad array-cell leg at offset $start in path: $s " +
                "(only literal non-negative indexes are logged in diffs)")
          legs += Cell(s.substring(start, i).toInt)
          i += 1
        case c =>
          throw new JsonDiffException(s"unexpected '$c' at offset $i in path: $s")
      }
    }
    legs.result()
  }

  /** Render a leg vector back to path text (writer/test convenience). */
  def renderPath(legs: Seq[Leg]): String =
    "$" + legs.map {
      case Member(k) =>
        if (k.nonEmpty && k.forall(c => c.isLetterOrDigit || c == '_')) s".$k"
        else "." + "\"" + k.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c => c.toString
        } + "\""
      case Cell(i) => s"[$i]"
    }.mkString

  // -- application -------------------------------------------------------
  /** Apply a diff vector to a document, in log order. Strict: a diff
    * whose path does not match the document shape throws — see the
    * object scaladoc for why silence is not an option here.
    */
  def apply(doc: JVal, diffs: Seq[Diff]): JVal =
    diffs.foldLeft(doc)(applyOne)

  def applyOne(doc: JVal, d: Diff): JVal = {
    val legs = parsePath(d.path)
    if (legs.isEmpty) {
      // whole-document leg: only REPLACE is meaningful (the server logs
      // a full value instead of INSERT/REMOVE at '$')
      if (d.op == OpReplace) d.value.get
      else throw new JsonDiffException(s"${opName(d.op)} at root path '$$'")
    } else descend(doc, legs.toList, d)
  }

  private def fail(msg: String, d: Diff): Nothing =
    throw new JsonDiffException(s"${opName(d.op)} ${d.path}: $msg")

  private def descend(v: JVal, legs: List[Leg], d: Diff): JVal = legs match {
    case leg :: Nil => leaf(v, leg, d)
    case leg :: rest => (v, leg) match {
      case (JObj(fields), Member(k)) =>
        val i = fields.indexWhere(_._1 == k)
        if (i < 0) fail(s"member '$k' not found", d)
        JObj(fields.updated(i, (k, descend(fields(i)._2, rest, d))))
      case (JArr(items), Cell(i)) =>
        if (i < 0 || i >= items.length)
          fail(s"array index $i out of bounds (${items.length})", d)
        JArr(items.updated(i, descend(items(i), rest, d)))
      case (JObj(_), Cell(_)) => fail("array-cell leg into an object", d)
      case (JArr(_), Member(_)) => fail("member leg into an array", d)
      case _ => fail("path descends into a scalar", d)
    }
    case Nil => v // unreachable: applyOne handles the empty path
  }

  private def leaf(parent: JVal, leg: Leg, d: Diff): JVal =
    (parent, leg, d.op) match {
      case (JObj(fields), Member(k), OpReplace) =>
        val i = fields.indexWhere(_._1 == k)
        if (i < 0) fail(s"member '$k' not found", d)
        JObj(fields.updated(i, (k, d.value.get)))
      case (JObj(fields), Member(k), OpInsert) =>
        // new members append in arrival order — [[MysqlJsonBinary]]
        // encodes and renders stored order, so application order IS
        // the rendered order (deterministic for the oracle)
        if (fields.exists(_._1 == k)) fail(s"member '$k' already present", d)
        JObj(fields :+ (k -> d.value.get))
      case (JObj(fields), Member(k), OpRemove) =>
        val i = fields.indexWhere(_._1 == k)
        if (i < 0) fail(s"member '$k' not found", d)
        JObj(fields.patch(i, Nil, 1))
      case (JArr(items), Cell(i), OpReplace) =>
        if (i < 0 || i >= items.length)
          fail(s"array index $i out of bounds (${items.length})", d)
        JArr(items.updated(i, d.value.get))
      case (JArr(items), Cell(i), OpInsert) =>
        // JSON_ARRAY_INSERT semantics: past-the-end appends
        JArr(items.patch(math.min(i, items.length), Seq(d.value.get), 0))
      case (JArr(items), Cell(i), OpRemove) =>
        if (i < 0 || i >= items.length)
          fail(s"array index $i out of bounds (${items.length})", d)
        JArr(items.patch(i, Nil, 1))
      case (JObj(_), Cell(_), _) => fail("array-cell leg into an object", d)
      case (JArr(_), Member(_), _) => fail("member leg into an array", d)
      case _ => fail("path addresses into a scalar", d)
    }

  // -- wire codec ---------------------------------------------------------
  def encode(diffs: Seq[Diff]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def u1(v: Int): Unit = out.write(v & 0xff)
    def lenenc(v: Long): Unit =
      if (v < 0xfb) u1(v.toInt)
      else if (v < 0x10000) { u1(0xfc); u1(v.toInt); u1((v >> 8).toInt) }
      else if (v < 0x1000000) {
        u1(0xfd); u1(v.toInt); u1((v >> 8).toInt); u1((v >> 16).toInt)
      } else {
        u1(0xfe)
        var i = 0
        while (i < 8) { u1((v >> (8 * i)).toInt); i += 1 }
      }
    diffs.foreach { d =>
      u1(d.op)
      val pb = d.path.getBytes(StandardCharsets.UTF_8)
      lenenc(pb.length.toLong); out.write(pb)
      d.value.foreach { v =>
        val vb = MysqlJsonBinary.encodeValue(v)
        lenenc(vb.length.toLong); out.write(vb)
      }
    }
    out.toByteArray
  }

  /** Decode a diff vector. Every length is bounds-checked — a corrupt
    * byte surfaces as a [[JsonDiffException]], never as a silently
    * misparsed diff (the caller wraps it into the binlog's
    * format-exception taxonomy).
    */
  def decode(bytes: Array[Byte]): Seq[Diff] = {
    var p = 0
    def u1(): Int = {
      if (p >= bytes.length)
        throw new JsonDiffException(s"diff vector truncated at offset $p")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def lenenc(): Long = u1() match {
      case v if v < 0xfb => v.toLong
      case 0xfc => (u1() | (u1() << 8)).toLong
      case 0xfd => (u1() | (u1() << 8) | (u1() << 16)).toLong
      case 0xfe =>
        var v = 0L; var i = 0
        while (i < 8) { v |= (u1().toLong << (8 * i)); i += 1 }
        v
      case v =>
        throw new JsonDiffException(
          s"bad lenenc prefix 0x${v.toHexString} at offset ${p - 1}")
    }
    def take(n: Long, what: String): Array[Byte] = {
      if (n < 0 || p + n > bytes.length)
        throw new JsonDiffException(
          s"$what of $n bytes overruns the diff vector at offset $p")
      val out = java.util.Arrays.copyOfRange(bytes, p, p + n.toInt)
      p += n.toInt; out
    }
    val b = Seq.newBuilder[Diff]
    while (p < bytes.length) {
      val op = u1()
      if (op < OpReplace || op > OpRemove)
        throw new JsonDiffException(s"unknown diff operation $op at offset ${p - 1}")
      val path = new String(take(lenenc(), "path"), StandardCharsets.UTF_8)
      parsePath(path) // validate early: a garbled path fails HERE, with offsets
      val value =
        if (op == OpRemove) None
        else Some(
          try MysqlJsonBinary.decodeValue(take(lenenc(), "value"))
          catch { case e: JsonBinaryException =>
            throw new JsonDiffException(s"diff value decode: ${e.getMessage}")
          })
      b += Diff(op, path, value)
    }
    b.result()
  }
}
