package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny embedding frame: 2-D points, label 0 = +class. */
  private def frame(pts: Seq[(Long, Seq[Float], Int)]) =
    pts.toDF("vec_id", "embedding", "label")

  test("learns a linearly separable split exactly") {
    // +class clustered at (1, 1), -class at (-1, -1): one round of
    // updates from w=0 already separates; 3 rounds must end with
    // zero confusion off-diagonal
    val pts = (0 until 20).map { i =>
      val s = if (i % 2 == 0) 1f else -1f
      val jitter = (i % 5) * 0.01f
      (i.toLong, Seq(s * (1f + jitter), s * (1f - jitter)),
        if (s > 0) 0 else 9)
    }
    val q = Perceptron.quantize(frame(pts), col("label") <= 4)
    val w = Perceptron.train(q, dims = 3, rounds = 3)
    val conf = Perceptron.classify(q, w)
      .groupBy("y", "y_pred").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(conf.getOrElse((1L, 1L), 0L) == 10)
    assert(conf.getOrElse((-1L, -1L), 0L) == 10)
    assert(conf.keySet == Set((1L, 1L), (-1L, -1L)))
  }

  test("trainAveraged is the exact sum of per-round weights; separable still exact") {
    val pts = (0 until 20).map { i =>
      val s = if (i % 2 == 0) 1f else -1f
      val jitter = (i % 5) * 0.01f
      (i.toLong, Seq(s * (1f + jitter), s * (1f - jitter)),
        if (s > 0) 0 else 9)
    }
    val q = Perceptron.quantize(frame(pts), col("label") <= 4)
    // identity: the averaged vector IS Σ_r w_r (r = 1..rounds)
    val avg = Perceptron.trainAveraged(q, dims = 3, rounds = 3)
    val sums = (1 to 3).map(r => Perceptron.train(q, dims = 3, rounds = r))
    assert(avg.toSeq == sums.transpose.map(_.sum).toSeq)
    // on separable data the averaged classifier is still exact
    val conf = Perceptron.classify(q, avg)
      .groupBy("y", "y_pred").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(conf.keySet == Set((1L, 1L), (-1L, -1L)))
  }

  test("round 1 from w=0 updates on EVERY row (ties are errors)") {
    val pts = Seq(
      (0L, Seq(0.5f, 0.25f), 0),
      (1L, Seq(-0.25f, -0.5f), 9))
    val q = Perceptron.quantize(frame(pts), col("label") <= 4)
    val w = Perceptron.train(q, dims = 3, rounds = 1)
    // w1 = Σ y·x on the ×1024 grid: (512,256,1024) - (-256,-512,1024)
    assert(w.toSeq == Seq(768L, 768L, 0L))
  }

  test("training is partitioning-invariant (bit-equal weights)") {
    val pts = (0 until 100).map { i =>
      (i.toLong, Seq((i % 13).toFloat / 13f - 0.4f,
        (i % 7).toFloat / 7f - 0.6f), i % 10)
    }
    val w1 = Perceptron.train(
      Perceptron.quantize(frame(pts).repartition(1), col("label") <= 4),
      dims = 3, rounds = 3)
    val w7 = Perceptron.train(
      Perceptron.quantize(frame(pts).repartition(7), col("label") <= 4),
      dims = 3, rounds = 3)
    assert(w1.toSeq == w7.toSeq)
  }

  test("quantization is the exact power-of-2 grid with bias appended") {
    val q = Perceptron.quantize(
      frame(Seq((0L, Seq(0.5f, -0.25f), 0))), col("label") <= 4)
      .collect()(0)
    assert(q.getLong(1) == 1L)
    assert(q.getSeq[Long](2) == Seq(512L, -256L, 1024L))
  }
}
