package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("synthetic media table carries typed metadata beside binary payload") {
    val media = syntheticMedia(Tables.documents(spark, sf))
    val row = media.filter(col("doc_id") === 1).head()
    assert(row.getAs[String]("modality") == "audio") // 1 % 3 = 1
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[Int]("meta_width") == 1 % 64 * 16 + 16)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("meta_sample_rate") == "int")
  }

  test("feature extraction runs distributed over partitions with exact stub output") {
    val media = syntheticMedia(Tables.documents(spark, sf).limit(50))
      .repartition(4).as[MediaRow]
    val feats = extractFeatures(media).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.feature.length == FakeDecoder.FeatureDim)
      assert(f.n_bytes > 0)
    }
    // determinism: same payload → same feature
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").head().getString(0)
    val expected = FakeDecoder.decode(doc0.getBytes("UTF-8"))
    val got = feats.find(_.doc_id == 0L).get.feature
    assert(got.toSeq == expected.toSeq)
  }

  test("frame sampling explodes video payloads into bounded frames") {
    val media = syntheticMedia(Tables.documents(spark, sf))
    val frames = sampleFrames(media, 3)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_idx", "frame_payload"))
    val grouped = frames.groupBy("doc_id").count().collect()
    assert(grouped.nonEmpty)
    grouped.foreach(r => assert(r.getLong(1) <= 3))
  }
}
