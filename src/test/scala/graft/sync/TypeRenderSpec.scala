package graft.sync

import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Date, Timestamp}

/** The reference's value-render ladder edge cases (SURVEY §1.2):
  * quote-bearing strings (sync.py:63), NULL (sync.py:67), decimal
  * trailing zeros (sync.py:77-83), date/datetime ISO (sync.py:65).
  */
class TypeRenderSpec extends AnyFunSuite {
  import TypeRender._

  test("string branch doubles single quotes") {
    assert(renderLiteral("it's") == "'it''s'")
    assert(renderLiteral("''") == "''''''")
    assert(renderLiteral("plain") == "'plain'")
  }

  test("quote doubling doubles every quote in random strings") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = List.fill(rng.nextInt(40))(
        "ab'\"\n\\x".charAt(rng.nextInt(7))).mkString
      val rendered = escapeQuotes(s)
      assert(rendered.count(_ == '\'') == 2 * s.count(_ == '\''))
      assert(rendered.replace("''", "'") == s)
    }
  }

  test("NULL branch renders unquoted NULL") {
    assert(renderLiteral(null) == "NULL")
  }

  test("numeric branches render unquoted") {
    assert(renderLiteral(42) == "42")
    assert(renderLiteral(42L) == "42")
    assert(renderLiteral(4.5d) == "4.5")
  }

  test("decimal branch preserves trailing zeros (the reference's CH battle)") {
    assert(renderLiteral(new java.math.BigDecimal("4.00")) == "4.00")
    assert(renderLiteral(BigDecimal("0.10")) == "0.10")
    assert(renderLiteral(new java.math.BigDecimal("1E+2")) == "100")
  }

  test("datetime/date branches render quoted ISO") {
    assert(renderLiteral(Timestamp.valueOf("2024-01-02 03:04:05")) ==
      "'2024-01-02 03:04:05'")
    assert(renderLiteral(Date.valueOf("2024-01-02")) == "'2024-01-02'")
  }

  test("insert statement shape matches the reference's batch INSERT") {
    val sql = renderInsert("t", Seq("a", "b"),
      Seq(Seq(1, "x'y"), Seq(2, null)))
    assert(sql == "INSERT INTO t (a, b) VALUES (1, 'x''y'), (2, NULL)")
  }
}
