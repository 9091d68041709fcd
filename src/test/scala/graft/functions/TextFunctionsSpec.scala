package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("tokenCount counts whitespace runs as single separators") {
    assert(one("a b  c\t d", TextFunctions.tokenCount(col("text"))) == 4L)
    assert(one("solo", TextFunctions.tokenCount(col("text"))) == 1L)
  }

  test("bpeish tokenizer splits letter/digit/punct runs") {
    // "ab12,cd" → [ab][12][,][cd]
    assert(one("ab12,cd", TextFunctions.bpeishTokenCount(col("text"))) == 4L)
  }

  test("fingerprint matches the hand-computed rolling hash") {
    // "ab": ((0*131+97)%p)*131+98 % p = 12805
    assert(one("ab", TextFunctions.fingerprint(col("text"))) == 12805L)
    assert(one("", TextFunctions.fingerprint(col("text"))) == 0L)
  }

  test("langId identifies hand-labeled snippets") {
    def lid(t: String): Any = one(t, TextFunctions.langId(col("text")))
    assert(lid("the cat and the dog is in that house with food") == "en")
    assert(lid("der hund und die katze ist nicht ein problem") == "de")
    assert(lid("le chat et la maison est dans une rue") == "fr")
    assert(lid("el perro es una mascota que vive por la casa como rey") == "es")
    assert(lid("这 是 中文 文本") == "zh")
    assert(lid("это русский текст про всё") == "ru")
    assert(lid("il gatto non vive per sempre nella casa della nonna") == "it")
    assert(lid("o cachorro é um animal não muito grande para casa") == "pt")
    assert(lid("het huis is niet ver van een mooie stad met veel bomen") == "nl")
    assert(lid("zzz qqq xxx") == "unknown")
  }

  test("stopwordRatio and charClassRatio are exact fractions") {
    assert(one("the dog of war", TextFunctions.stopwordRatio(col("text"))) == 0.5)
    assert(one("a1b2", TextFunctions.charClassRatio(col("text"), "[0-9]")) == 0.5)
  }

  test("wordShingles emits distinct n-grams in order; short docs emit none") {
    val got = one("a b c d", TextFunctions.wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got == Seq("a b c", "b c d"))
    val dup = one("x y x y x y", TextFunctions.wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(dup == Seq("x y x", "y x y")) // deduplicated, first-occurrence order
    val short = one("a b", TextFunctions.wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short.isEmpty) // kernel semantics: under n tokens → no shingles
  }

  test("qualityScore orders clean prose above digit soup") {
    val clean = one("the quick brown fox jumps over the lazy dog and runs on",
      TextFunctions.qualityScore(col("text"))).asInstanceOf[Double]
    val soup = one("8237 1231 9999 0000 4857 1209 3333 7777",
      TextFunctions.qualityScore(col("text"))).asInstanceOf[Double]
    assert(clean > soup)
  }
}
