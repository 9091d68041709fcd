package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RocchioSpec extends SparkSpec {
  import spark.implicits._

  private def frame(pts: Seq[(Long, Seq[Float], Int)]) =
    pts.toDF("vec_id", "embedding", "label")

  test("classifies two separated clusters perfectly") {
    val pts = (0 until 30).map { i =>
      val s = if (i % 2 == 0) 1f else -1f
      val j = (i % 5) * 0.02f
      (i.toLong, Seq(s * (0.8f + j), s * (0.6f - j)), if (s > 0) 0 else 1)
    }
    val q = Perceptron.quantize(frame(pts), col("label") === 0, bias = false)
    val m = Rocchio.fit(q, 2)
    assert(m.nPos == 15 && m.nNeg == 15)
    val out = Rocchio.classify(q, m)
    assert(out.filter(col("y") =!= col("y_pred")).count() == 0)
  }

  test("overlapping classes: decision follows the nearer centroid exactly") {
    // centroids +1 → (10, 0), -1 → (0, 10) on the 1/1024 grid; the
    // probe (6, 4) is nearer the +1 centroid
    val pts = Seq(
      (0L, Seq(10f / 1024, 0f), 0), (1L, Seq(0f, 10f / 1024), 1),
      (2L, Seq(6f / 1024, 4f / 1024), 1)) // true label -1, predicted +1
    val q = Perceptron.quantize(frame(pts), col("label") === 0, bias = false)
    val m = Rocchio.fit(q.filter(col("vec_id") < 2), 2)
    val probe = Rocchio.classify(q.filter(col("vec_id") === 2), m)
      .collect()(0)
    assert(probe.getLong(1) == -1L && probe.getLong(2) == 1L)
  }

  test("equidistant probe predicts the negative class (pinned tie rule)") {
    val pts = Seq(
      (0L, Seq(8f / 1024, 0f), 0), (1L, Seq(0f, 8f / 1024), 1),
      (2L, Seq(5f / 1024, 5f / 1024), 0))
    val q = Perceptron.quantize(frame(pts), col("label") === 0, bias = false)
    val m = Rocchio.fit(q.filter(col("vec_id") < 2), 2)
    val probe = Rocchio.classify(q.filter(col("vec_id") === 2), m)
      .collect()(0)
    assert(probe.getLong(2) == -1L)
  }

  test("fit is partitioning-invariant (exact integer sums)") {
    val pts = (0 until 120).map(i =>
      (i.toLong, Seq((i % 17).toFloat / 17f - 0.3f,
        (i % 11).toFloat / 11f - 0.7f), i % 2))
    val m1 = Rocchio.fit(Perceptron.quantize(
      frame(pts).repartition(1), col("label") === 0, bias = false), 2)
    val m7 = Rocchio.fit(Perceptron.quantize(
      frame(pts).repartition(7), col("label") === 0, bias = false), 2)
    assert(m1 == m7.copy(sPos = m1.sPos, sNeg = m1.sNeg) &&
      m1.sPos.toSeq == m7.sPos.toSeq && m1.sNeg.toSeq == m7.sNeg.toSeq)
  }
}
