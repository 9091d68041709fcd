package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Invariants of the greedy sequence packer: budget respected (except
  * oversize singletons), doc order preserved, nothing lost, packs
  * maximal (no doc could have joined the previous pack).
  */
class SeqPackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 64L
  private lazy val docs = Tables.documents(spark, sf)

  test("every pack fits the budget unless it is a single oversize doc") {
    val stats = SeqPacking.packStats(docs, budget, 4).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val tokens = r.getAs[Long]("pack_tokens")
      assert(tokens <= budget || nDocs == 1L,
        s"pack over budget with $nDocs docs / $tokens tokens")
    }
  }

  test("packing is a permutation-free partition of the corpus in doc order") {
    val packed = SeqPacking.packDocs(docs, budget, 4)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // within a bucket, pack_id is non-decreasing in doc_id order
    val rows = packed.orderBy("bucket", "doc_id")
      .select("bucket", "doc_id", "pack_id")
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val packs = rs.sortBy(_._2).map(_._3)
      assert(packs.zip(packs.tail).forall { case (a, b) => b == a || b == a + 1 },
        "pack ids must step by at most 1 in doc order")
    }
  }

  test("packs are maximal: the first doc of pack p+1 would overflow pack p") {
    val perDoc = SeqPacking.packDocs(docs, budget, 4)
    val fills = perDoc.groupBy("bucket", "pack_id")
      .agg(sum("n_tokens").as("fill")).as[(Long, Long, Long)]
      .collect().map { case (b, p, f) => (b, p) -> f }.toMap
    val firstOfPack = perDoc.groupBy("bucket", "pack_id")
      .agg(min(struct(col("doc_id"), col("n_tokens"))).as("f"))
      .select(col("bucket"), col("pack_id"), col("f.n_tokens"))
      .as[(Long, Long, Long)].collect()
    firstOfPack.filter(_._2 > 0).foreach { case (b, p, firstTok) =>
      assert(fills((b, p - 1L)) + firstTok > budget,
        s"pack $p in bucket $b started although pack ${p - 1} had room")
    }
  }
}
