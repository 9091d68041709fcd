package graft.sync

import org.scalatest.funsuite.AnyFunSuite

import ChunkPlanner._

/** Property tests for the chunk arithmetic (SURVEY §5.2): union of
  * half-open chunks == the full id range with zero overlap — the class
  * of bug the reference's closed intervals have (SURVEY §3.4-1).
  * (Seeded manual generators — the offline cache has no
  * scalatest-scalacheck bridge artifact.)
  */
class ChunkPlannerSpec extends AnyFunSuite {

  test("half-open chunks exactly cover [min, max] with no overlap") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val min = rng.nextLong(100000L)
      val max = min + rng.nextLong(50000L)
      val batch = 1L + rng.nextLong(10000L)
      val chunks = halfOpenChunks(min, max, batch)
      // coverage: every id in [min, max] falls in exactly one chunk
      assert(chunks.headOption.map(_._1).contains(min))
      assert(chunks.lastOption.map(_._2).contains(max + 1))
      // contiguity == coverage + disjointness for sorted chunks
      chunks.sliding(2).foreach {
        case Vector((_, hi1), (lo2, _)) => assert(hi1 == lo2)
        case _ =>
      }
      // each chunk non-empty and ≤ batch wide
      chunks.foreach { case (lo, hi) =>
        assert(lo < hi); assert(hi - lo <= batch)
      }
    }
  }

  test("reference's closed intervals double-read batch boundaries (documented bug)") {
    // stride == batch with closed [lo, hi] bounds ⇒ row at lo+batch is in
    // chunk k (as its hi) AND chunk k+1 (as its lo) — sync.py:44,109-112
    val chunks = closedChunksReferenceBug(0L, 2000L, 1000L)
    assert(chunks == Vector((0L, 1000L), (1000L, 2000L), (2000L, 2000L)))
    // id 1000 appears in both first and second closed intervals
    assert(chunks.count { case (lo, hi) => lo <= 1000L && 1000L <= hi } == 2)
  }

  test("empty / single-row / small / no-PK strategy dispatch") {
    assert(plan((0L, 0L), 0L, hasAutoInc = true, 1000L) == Empty)
    assert(plan((7L, 7L), 1L, hasAutoInc = true, 1000L) == SingleRow)
    assert(plan((1L, 999L), 500L, hasAutoInc = true, 1000L) == Paginated)
    // small no-PK table: one ordered page; LARGE no-PK table: parallel
    // synthetic split, never a one-task copy
    assert(plan((0L, 0L), 500L, hasAutoInc = false, 1000L) == Paginated)
    assert(plan((1L, 5000L), 5000L, hasAutoInc = false, 1000L) ==
      SyntheticSplit(5))
    assert(plan((0L, 0L), 10000000L, hasAutoInc = false, 10L,
      maxPartitions = 64) == SyntheticSplit(64))
    plan((1L, 5000L), 5000L, hasAutoInc = true, 1000L) match {
      case RangeChunks(cs) => assert(cs.size == 5)
      case other => fail(s"expected RangeChunks, got $other")
    }
  }

  test("numPartitions: ceil(rows/batch), capped, ≥1") {
    assert(numPartitions(0L, 1000L) == 1)
    assert(numPartitions(1000L, 1000L) == 1)
    assert(numPartitions(1001L, 1000L) == 2)
    assert(numPartitions(10000000L, 10L, maxPartitions = 2048) == 2048)
  }
}
