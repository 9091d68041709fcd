package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for LLM pretraining ([EXT] X4 adjunct): greedily
  * pack documents into fixed token-budget sequences, preserving a
  * deterministic document order. The canonical batching step between a
  * curated corpus and a trainer — at 100 TB the corpus is hash-sharded
  * into `buckets` independent streams and each stream packs in one
  * ordered pass.
  *
  * Spark shape: `groupByKey(bucket).flatMapSortedGroups(doc_id)` — the
  * shuffle does a secondary sort, so the per-bucket scan is a streaming
  * iterator (no group materialization, no driver involvement), and
  * bucket count = parallelism. The greedy rule is the standard one:
  * a document joins the current pack unless it would overflow `budget`;
  * a document larger than `budget` alone gets its own pack.
  */
object SeqPacking {

  // NOT private: the codegen'd encoder projections need public access
  case class DocTok(bucket: Long, doc_id: Long, n_tokens: Long)
  case class PackedDoc(bucket: Long, doc_id: Long, n_tokens: Long,
                       pack_id: Long)

  /** Per-document pack assignment: (bucket, doc_id, n_tokens, pack_id)
    * with pack_id counting from 0 within each bucket in doc_id order.
    */
  def packDocs(docs: DataFrame, budget: Long, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .as[DocTok]
      .groupByKey(_.bucket)
      .flatMapSortedGroups(asc("doc_id")) { (bucket, it) =>
        var pack = 0L
        var fill = 0L
        it.map { d =>
          if (fill > 0L && fill + d.n_tokens > budget) { pack += 1L; fill = 0L }
          fill += d.n_tokens
          PackedDoc(bucket, d.doc_id, d.n_tokens, pack)
        }
      }
      .toDF()
  }

  /** Per-pack summary (the registered query's shape — scalar columns
    * only): docs per pack, token fill, and the contiguous doc-id span.
    */
  def packStats(docs: DataFrame, budget: Long, buckets: Int): DataFrame =
    packDocs(docs, budget, buckets)
      .groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bucket", "pack_id")
}
