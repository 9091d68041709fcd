package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Continuous profiling: rows/nulls/exact-NDV maintained from deltas
  * must equal direct profiling of the live multiset — including the
  * case a retraction-blind sketch gets wrong: a deleted value's NDV
  * contribution must GO AWAY, and come back on re-insert.
  */
class CdcProfileSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType),
    StructField("amt", DoubleType)))
  private val spec = CdcProfile.ProfileSpec("fact", schema,
    Seq("cat", "amt"))

  private def f(k: Long, cat: String, amt: java.lang.Double): String = {
    val c = if (cat == null) "null" else s""""$cat""""
    val a = if (amt == null) "null" else amt.toString
    s"""{"k":$k,"cat":$c,"amt":$a}"""
  }

  /** Final live multiset: rows k=1 (a, 1.0), k=3 (b, null), k=4 (a, 2.0).
    * cat: n=3, nulls=0, ndv=2; amt: n=3, nulls=1, ndv=2. The 'c'
    * category and the 9.0 value exist mid-history and are RETRACTED.
    */
  private def changes: Seq[KeyedChangeRow] = Seq(
    KeyedChangeRow("fact", "insert", f(1, "a", 1.0), null, "s", 1),
    KeyedChangeRow("fact", "insert", f(2, "c", 9.0), null, "s", 2),
    // the only 'c'/9.0 row dies: NDV must drop on both columns
    KeyedChangeRow("fact", "delete", null, f(2, "c", 9.0), "s", 3),
    // null amt arrives via an update (retract 5.0, add null)
    KeyedChangeRow("fact", "insert", f(3, "b", 5.0), null, "s", 4),
    KeyedChangeRow("fact", "update", f(3, "b", null), f(3, "b", 5.0), "s", 5),
    // a second 'a' row: ndv unchanged, counts up
    KeyedChangeRow("fact", "insert", f(4, "a", 2.0), null, "s", 6))

  private def asMap(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("retraction-exact NDV: deleted values leave, nulls counted, twin") {
    val out = asMap(CdcProfile.maintain(changes.toDF(), 1, spec))
    assert(out("cat") == (3L, 0L, 2L))
    assert(out("amt") == (3L, 1L, 2L))
  }

  test("NDV returns when a retracted value is re-inserted") {
    val more = changes ++ Seq(
      KeyedChangeRow("fact", "insert", f(5, "c", 9.0), null, "s", 7))
    val out = asMap(CdcProfile.maintain(more.toDF(), 2, spec))
    assert(out("cat") == (4L, 0L, 3L))
    assert(out("amt") == (4L, 1L, 3L))
  }

  test("batching invariance: 1 == 3 == 5 (linear sums + telescoping NDV)") {
    val r1 = asMap(CdcProfile.maintain(changes.toDF(), 1, spec))
    assert(asMap(CdcProfile.maintain(changes.toDF(), 3, spec)) == r1)
    assert(asMap(CdcProfile.maintain(changes.toDF(), 5, spec)) == r1)
  }

  test("streaming form equals the replay twin; total from batch zero") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdcprof_").toString
    val empty = asMap(CdcProfile.view(spark, s"$dir/state", spec))
    assert(empty == Map("cat" -> (0L, 0L, 0L), "amt" -> (0L, 0L, 0L)))
    val input = MemoryStream[KeyedChangeRow]
    val q = CdcProfile.start(input.toDF(), s"$dir/state", s"$dir/ckpt", spec)
    try {
      changes.grouped(2).foreach { c =>
        input.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = asMap(CdcProfile.view(spark, s"$dir/state", spec))
      val twin = asMap(CdcProfile.maintain(changes.toDF(), 1, spec))
      assert(streamed == twin)
    } finally q.stop()
  }
}
