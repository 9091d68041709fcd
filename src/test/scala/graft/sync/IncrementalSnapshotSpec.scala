package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the DBLog watermark algebra of IncrementalSnapshot.merge on
  * hand-built frames: who outranks whom at/around a chunk's low
  * watermark, and the delete/late-insert edges.
  */
class IncrementalSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def state(snapRows: Seq[(Long, String, Long)],
                    evRows: Seq[(Long, String, Long, String)]): Map[Long, String] = {
    val snap = snapRows.toDF("k", "v", "version")
    val ch = evRows.toDF("k", "v", "version", "op")
    IncrementalSnapshot.merge(snap, ch, Seq("k"))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("event after the chunk watermark outranks the chunk image") {
    val got = state(
      snapRows = Seq((1L, "stale", 100L)),
      evRows = Seq((1L, "fresh", 150L, "update")))
    assert(got == Map(1L -> "fresh"))
  }

  test("chunk image wins a tie at its watermark (recorded before the read)") {
    val got = state(
      snapRows = Seq((1L, "image-reflects-ev", 100L)),
      evRows = Seq((1L, "same-event", 100L, "update")))
    assert(got == Map(1L -> "image-reflects-ev"))
  }

  test("chunk image wins over events at or before the watermark") {
    val got = state(
      snapRows = Seq((1L, "image", 100L)),
      evRows = Seq((1L, "older", 40L, "insert"), (1L, "old", 90L, "update")))
    assert(got == Map(1L -> "image"))
  }

  test("a delete after the chunk read erases the key") {
    val got = state(
      snapRows = Seq((1L, "image", 100L), (2L, "keep", 100L)),
      evRows = Seq((1L, "x", 170L, "delete")))
    assert(got == Map(2L -> "keep"))
  }

  test("a key born after its chunk was read arrives from the log alone") {
    val got = state(
      snapRows = Seq((1L, "image", 100L)),
      evRows = Seq((2L, "late-born", 300L, "insert")))
    assert(got == Map(1L -> "image", 2L -> "late-born"))
  }

  test("delete-then-reinsert across the watermark resurrects the key") {
    // deleted before this chunk read (no image), reinserted after
    val got = state(
      snapRows = Seq.empty,
      evRows = Seq((1L, "v1", 50L, "insert"), (1L, "x", 80L, "delete"),
        (1L, "v2", 200L, "insert")))
    assert(got == Map(1L -> "v2"))
  }

  test("snapshot frames must not smuggle an op column") {
    val snap = Seq((1L, "a", 1L, "insert")).toDF("k", "v", "version", "op")
    val ch = Seq((1L, "b", 2L, "update")).toDF("k", "v", "version", "op")
    val e = intercept[IllegalArgumentException] {
      IncrementalSnapshot.merge(snap, ch, Seq("k"))
    }
    assert(e.getMessage.contains("implicit upserts"))
  }

  test("two chunks with different watermarks merge independently per key") {
    // chunk A (wm=100) holds k=1; chunk B (wm=200) holds k=2; one event
    // at 150 touches both keys: it outranks A's image but not B's
    val got = state(
      snapRows = Seq((1L, "imgA", 100L), (2L, "imgB", 200L)),
      evRows = Seq((1L, "ev150", 150L, "update"), (2L, "ev150", 150L, "update")))
    assert(got == Map(1L -> "ev150", 2L -> "imgB"))
  }
}
