package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzzed agreement between the distributed exact-arithmetic operators
  * and straight-line sequential references implementing the same
  * integer contracts (the MysqlBinlogSpec round-trip ethos applied to
  * the vector/graph/robust-stats surface): random inputs, bit-exact
  * equality expected — any divergence is a real contract violation,
  * never float noise. (Seeded manual generators — the offline cache
  * has no scalatest-scalacheck bridge artifact.)
  */
class ExactOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Float): Long =
    math.floor(v.toDouble * KMeansExact.Scale.toDouble + 0.5).toLong

  test("k-means fit matches a sequential reference on random inputs") {
    val rng = new scala.util.Random(4242)
    for (round <- 1 to 8) {
      val n = 10 + rng.nextInt(30)
      val dim = 4 + rng.nextInt(5)
      val k = 2 + rng.nextInt(3)
      val iters = rng.nextInt(3)
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rng.nextFloat() * 2f - 1f))
      }
      // sequential reference: same quantize / first-k seed / toward-zero
      // recenter / lowest-cluster ties
      val q = vecs.map { case (id, v) => (id, v.map(quant)) }
      var cents: Array[Array[Long]] = q.take(k).map(_._2.clone).toArray
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var s = 0L; var i = 0
        while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }; s
      }
      def assign1(x: Array[Long]): (Int, Long) = {
        var best = 0; var bd = d2(x, cents(0))
        for (j <- 1 until k) {
          val dd = d2(x, cents(j)); if (dd < bd) { bd = dd; best = j }
        }
        (best, bd)
      }
      for (_ <- 0 until iters) {
        val groups = q.groupBy(v => assign1(v._2)._1)
        val next = cents.map(_.clone)
        groups.foreach { case (c, vs) =>
          for (d0 <- 0 until dim)
            next(c)(d0) = vs.map(_._2(d0)).sum / vs.length
        }
        cents = next
      }
      val expectSet = q.map { case (id, x) =>
        val (c, d) = assign1(x); (id, c, d)
      }.toSet
      val df = vecs.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val got = KMeansExact.fit(df.repartition(3), k, iters).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expectSet, s"round $round (n=$n dim=$dim k=$k iters=$iters)")
    }
  }

  test("label propagation matches a sequential reference on random graphs") {
    val rng = new scala.util.Random(777)
    for (round <- 1 to 8) {
      val n = 5 + rng.nextInt(15)
      val nodes = (0L until n.toLong).toVector
      val edges = (for {
        s <- nodes; t <- nodes
        if s != t && rng.nextInt(100) < 25
      } yield (s, t)).distinct
      if (edges.nonEmpty) {
        val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
        var lab = present.map(x => x -> x).toMap
        for (_ <- 0 until 2) {
          lab = present.map { x =>
            in.get(x) match {
              case None => x -> lab(x)
              case Some(srcs) =>
                val cnt = srcs.map(lab).groupBy(identity)
                  .map { case (l, g) => (l, g.size) }
                x -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
            }
          }.toMap
        }
        val got = graft.ops.LabelPropagation
          .communities(edges.toDF("src", "dst").repartition(3), 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == lab, s"round $round (n=$n |E|=${edges.size})")
      }
    }
  }

  test("MAD outliers match a sequential reference on random grouped doubles") {
    val rng = new scala.util.Random(31337)
    for (round <- 1 to 8) {
      val groups = 1 + rng.nextInt(4)
      val rows = (0 until 30 + rng.nextInt(60)).map { _ =>
        val g = s"g${rng.nextInt(groups)}"
        // duplicates on purpose: a small value grid forces ties
        (g, (rng.nextInt(20) - 5).toDouble / 2.0)
      }
      def lowerMed(xs: Seq[Double]): Double =
        xs.sorted.apply((xs.size - 1) / 2)
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val vs = rs.map(_._2)
        val med = lowerMed(vs)
        val mad = lowerMed(vs.map(v => math.abs(v - med)))
        val out = vs.count(v => math.abs(v - med) > 3.0 * mad)
        (g, (vs.size.toLong, med, mad, out.toLong))
      }
      val got = graft.ops.RobustStats
        .madOutliers(rows.toDF("g", "v").repartition(3), "g", "v")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
        .toMap
      assert(got == expect, s"round $round")
    }
  }

  test("streamed-profile recenter equals the corpus Lloyd recenter bit-for-bit") {
    val rng = new scala.util.Random(2024)
    for (round <- 1 to 5) {
      val n = 12 + rng.nextInt(20)
      val k = 2 + rng.nextInt(3)
      val dim = 4 + rng.nextInt(4)
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rng.nextFloat() - 0.5f).toSeq)
      }
      val df = vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val seed = KMeansExact.seedCentroids(KMeansExact.quantized(df), k)
      // sequential corpus recenter: assignment sums under the seed,
      // toward-zero division, empty clusters keep their centroid
      val q = vecs.map { case (id, v) => (id, v.map(quant).toArray) }
      def d2(a: Array[Long], j: Int): Long = {
        var s = 0L; var i = 0
        while (i < dim) {
          val d = a(i) - seed(j * dim + i); s += d * d; i += 1
        }; s
      }
      val expect = seed.clone()
      q.groupBy { case (_, x) =>
        (0 until k).minBy(j => (d2(x, j), j))
      }.foreach { case (c, vs) =>
        for (d0 <- 0 until dim)
          expect(c * dim + d0) = vs.map(_._2(d0)).sum / vs.length
      }
      // streamed path: two partial profiles in batch_id dirs, merged
      val dir = java.nio.file.Files.createTempDirectory("recenter_").toString
      val (h1, h2) = vecs.splitAt(n / 2)
      Seq(h1, h2).zipWithIndex.foreach { case (half, b) =>
        val hdf = half.toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>"))
        graft.streaming.ClusterProfileIngest.profileRows(hdf, seed, k)
          .withColumn("batch_id", lit(b.toLong))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"$dir/state")
      }
      val got = graft.streaming.ClusterProfileIngest
        .recenter(spark, s"$dir/state", seed, k)
      assert(got.toSeq == expect.toSeq, s"round $round (n=$n k=$k dim=$dim)")
    }
  }

  test("PCA power iteration matches a sequential BigInt reference") {
    val rng = new scala.util.Random(99)
    for (round <- 1 to 5) {
      val n = 8 + rng.nextInt(20)
      val dim = 3 + rng.nextInt(5)
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rng.nextFloat() - 0.5f))
      }
      val q = vecs.map(_._2.map(quant))
      val means = Array.tabulate(dim)(d => q.map(_(d)).sum / n)
      val c = q.map(x => Array.tabulate(dim)(d => x(d) - means(d)))
      val s = Array.tabulate(dim, dim)((i, j) =>
        c.map(x => BigInt(x(i)) * BigInt(x(j))).sum)
      val scale = BigInt(KMeansExact.Scale)
      var v = Array.fill(dim)(scale)
      for (_ <- 0 until 3) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => s(i)(j) * v(j)).sum)
        val mx = w.map(_.abs).max
        if (mx != 0) v = w.map(x => x * scale / mx)
      }
      val expect = v.zipWithIndex
        .map { case (x, d) => (d.toLong, x.toLong) }.toSet
      val df = vecs.map { case (id, x) => (id, x.toSeq) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val got = PcaPower.topComponent(df.repartition(3)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"round $round (n=$n dim=$dim)")
    }
  }
}
