package graft.sim

import graft.SparkSpec
import graft.model.Tables

class PcaPowerSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("output covers every dimension once; max |loading| is exactly Scale") {
    val out = PcaPower.topComponent(emb).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until out.length).toSeq)
    assert(out.map(r => math.abs(r.getLong(1))).max == KMeansExact.Scale)
  }

  test("partitioning-independent: repartition(7) and repartition(3) agree bit-for-bit") {
    val a = PcaPower.topComponent(emb.repartition(7)).collect()
    val b = PcaPower.topComponent(emb.repartition(3)).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("recovers a planted dominant axis") {
    import spark.implicits._
    // variance 100x larger along dim 2 than anywhere else
    val rows = (0 until 64).map { i =>
      val v = Array.fill(8)(0.001f * ((i * 7 + 3) % 5 - 2))
      v(2) = if (i % 2 == 0) 0.4f else -0.4f
      Tuple1(v)
    }
    val df = rows.toDF("embedding")
    val out = PcaPower.topComponent(df).collect()
    val top = out.maxBy(r => math.abs(r.getLong(1)))
    assert(top.getLong(0) == 2L, s"expected dim 2 dominant, got $top")
    assert(math.abs(top.getLong(1)) == KMeansExact.Scale)
  }
}
