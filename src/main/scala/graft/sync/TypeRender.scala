package graft.sync

import java.sql.{Date, Timestamp}
import java.time.format.DateTimeFormatter

/** The reference's value-render "type system" (SURVEY §1.2) as a pure,
  * testable function: the `isinstance` ladder that turns a row value
  * into a SQL literal for the batch INSERT string
  * (mysql_to_clickhouse_sync.py:60-74, identical at
  * mysql_to_clickhouse_sync_pagination.py:84-98).
  *
  * The engine itself never string-builds SQL for data movement (Spark's
  * JDBC writer uses PreparedStatement batching — SURVEY §3.4-4); this
  * exists because the ladder IS the reference's data model and its edge
  * cases (quote doubling, decimal trailing zeros, ISO datetimes, NULL)
  * are the correctness knowledge worth preserving and unit-testing.
  */
object TypeRender {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Render one value as a SQL literal, one branch per reference branch. */
  def renderLiteral(v: Any): String = v match {
    case null => "NULL"                       // sync.py:67-68
    case s: String =>                          // sync.py:62-64 — '' doubling
      "'" + escapeQuotes(s) + "'"
    case ts: Timestamp =>                      // sync.py:65-66 — ISO render
      "'" + ts.toLocalDateTime.format(tsFmt) + "'"
    case d: Date =>                            // sync.py:65-66
      "'" + d.toLocalDate.toString + "'"
    case i: Int => i.toString                  // sync.py:69-70 — unquoted
    case l: Long => l.toString
    case f: Float => f.toString
    case d: Double => d.toString
    case dec: java.math.BigDecimal =>          // sync.py:71-72 — scale kept:
      dec.toPlainString                        //   '4.00' stays '4.00'
    case dec: BigDecimal => dec.underlying.toPlainString
    case other =>                              // sync.py:73-74 — fallback
      "'" + escapeQuotes(other.toString) + "'"
  }

  /** F1: single quotes doubled (mysql_to_clickhouse_sync.py:63). */
  def escapeQuotes(s: String): String = s.replace("'", "''")

  /** Render a full `INSERT INTO t (cols) VALUES (...),(...)` statement the
    * way the reference does (mysql_to_clickhouse_sync.py:56,76) — columns
    * from the first record, one tuple per row.
    */
  def renderInsert(table: String, cols: Seq[String], rows: Seq[Seq[Any]]): String = {
    val colList = cols.mkString(", ")
    val values = rows.map(r => r.map(renderLiteral).mkString("(", ", ", ")")).mkString(", ")
    s"INSERT INTO $table ($colList) VALUES $values"
  }
}
