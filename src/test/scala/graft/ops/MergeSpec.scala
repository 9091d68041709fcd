package graft.ops

import graft.SparkSpec

/** Property test for MERGE INTO: on seeded random target/source tables,
  * the one-join implementation must equal a direct driver-side statement
  * of the semantics — matched U replaces, matched D removes, unmatched I
  * inserts, everything else (unmatched U/D, untouched targets) is
  * identity. (Seeded manual generators — the offline cache has no
  * scalatest-scalacheck bridge artifact.)
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeInto equals the reference merge algebra on seeded random tables") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 15) {
      val targetRows = (0 until 50).filter(_ => rng.nextBoolean())
        .map(k => (k.toLong, rng.nextInt(100).toLong))
      // unique source keys over a range wider than the target's, so all
      // of matched/unmatched × U/I/D occur; values independent
      val sourceRows = (0 until 70).filter(_ => rng.nextInt(3) == 0)
        .map(k => (k.toLong, Seq("U", "I", "D")(rng.nextInt(3)),
          rng.nextInt(100).toLong))
      val got = Merge.mergeInto(
        targetRows.toDF("k", "v"),
        sourceRows.toDF("k", "__action", "v"), "k")
        .as[(Long, Long)].collect().toSet
      val tm = targetRows.toMap
      val expected = scala.collection.mutable.Map(tm.toSeq: _*)
      sourceRows.foreach { case (k, a, v) =>
        a match {
          case "D" => if (tm.contains(k)) expected -= k
          case "U" => if (tm.contains(k)) expected(k) = v
          case "I" => if (!tm.contains(k)) expected(k) = v
        }
      }
      assert(got == expected.toSet)
    }
  }
}
