package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing ([EXT] X3, SURVEY §2.11): image/audio/video
  * as opaque `binary` payloads with typed metadata, processed in
  * partition-sized batches.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * STUB (`FakeDecoder` — deterministic bytes-in/features-out). Everything
  * around it is the real engine surface: the schema contract, the
  * `mapPartitions` batch shape (one decoder instance per partition, the
  * Scala analog of a `mapInPandas` batch UDF), partitioning, and the
  * feature-column output. Swapping `FakeDecoder.decode` for a JNI/codec
  * call changes nothing structurally.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      modality: String,            // "image" | "audio" | "video"
      payload: Array[Byte],        // opaque encoded media
      meta_width: Int,             // typed metadata travels beside payload
      meta_height: Int,
      meta_sample_rate: Int)

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float])       // fixed-size embedding from the decoder

  /** STUB decoder — stands in for an image/audio codec library.
    * Deterministic so tests can assert exact outputs: "decodes" a payload
    * into an 8-dim feature from byte statistics. A real deployment
    * replaces ONLY this object.
    *
    * Each dim is an exact integer byte-sum divided ONCE by 255.0 (double)
    * and rounded to float — a single well-defined IEEE rounding step, so
    * the value is reproducible by any engine (the DuckDB oracle computes
    * the same sum/divide/cast) with no accumulation-order sensitivity.
    */
  object FakeDecoder {
    val FeatureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        sums(i % FeatureDim) += (payload(i) & 0xff)
        i += 1
      }
      val f = new Array[Float](FeatureDim)
      i = 0
      while (i < FeatureDim) { f(i) = (sums(i) / 255.0).toFloat; i += 1 }
      f
    }
  }

  /** Manufacture a media table from the documents fixture: payload =
    * UTF-8 bytes of the text (deterministic), metadata derived from
    * lengths. Only exists because the harness ships no binary fixtures.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("meta_width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("meta_height"),
      lit(16000).as("meta_sample_rate"))

  /** Decode + feature-extract in partition-sized batches: one decoder
    * per partition (amortized init — the reason for mapPartitions over a
    * per-row UDF), rows streamed through it. Fully distributed; no
    * driver materialization.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would happen here (codec handles etc.)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
          FakeDecoder.decode(r.payload))
      }
    }
  }

  /** Pooled resize/resample: the thumbnail (image) / downsample (audio)
    * verb of the decode pipeline, on the stub decoder's byte "pixels" —
    * the payload stream is block-average-pooled into `k` equal slices
    * (slice j = byte indices [j·n/k, (j+1)·n/k), integer bounds). Sums
    * and counts stay exact integers through the shuffle-free
    * mapPartitions pass; the single divide + round happens once in the
    * projection, so any engine reproduces the values bit-for-bit. A
    * real deployment swaps the byte pooling for codec-aware scaling,
    * keeping the batching/partitioning shape.
    */
  final case class MediaPooled(
      doc_id: Long,
      modality: String,
      sums: Array[Long],
      cnts: Array[Long])

  def resizePooled(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val n = b.length
        val sums = new Array[Long](k)
        val cnts = new Array[Long](k)
        var j = 0
        while (j < k) {
          val lo = (j.toLong * n / k).toInt
          val hi = ((j + 1).toLong * n / k).toInt
          var i = lo
          var s = 0L
          while (i < hi) { s += (b(i) & 0xff); i += 1 }
          sums(j) = s
          cnts(j) = (hi - lo).toLong
          j += 1
        }
        MediaPooled(r.doc_id, r.modality, sums, cnts)
      }
    }.select(col("doc_id") +: col("modality") +: (0 until k).map { j =>
      when(col("cnts").getItem(j) === 0, lit(0.0))
        .otherwise(round(col("sums").getItem(j) / col("cnts").getItem(j), 4))
        .as(s"p$j")
    }: _*)
  }

  /** Frame sampling for video payloads: split the payload into `n` fixed
    * chunks ("frames") and explode — the per-frame fanout pattern used
    * before a frame-level model. Pure expression work (codegen'd).
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("doc_id"),
        // (?s): frames must cut every 256 chars even across line
        // terminators — without DOTALL a payload containing '\n' would
        // chunk wrong (real decoded bytes contain everything)
        posexplode(split(decode(col("payload"), "UTF-8"),
          s"(?s)(?<=\\G.{${256}})")).as(Seq("frame_idx", "frame_payload")))
      .filter(col("frame_idx") < n)
      // split keeps a trailing empty element on exact-multiple lengths
      // (and for empty payloads) — an empty frame is not a frame
      .filter(length(col("frame_payload")) > 0)
}
