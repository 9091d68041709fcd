package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  /** The helper's whole contract is bit-equality with `percentile()`. */
  private def assertMatchesPercentile(
      data: Seq[(String, Double)], qs: Seq[(String, Double)]): Unit = {
    val df = data.toDF("g", "x")
    val ours = HistQuantile.exactQuantiles(df, "g", "x", qs)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    val ref = df.groupBy("g")
      .agg(expr(s"percentile(x, array(${qs.map(_._2).mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap
    assert(ours.keySet == ref.keySet)
    for (g <- ref.keySet)
      assert(ours(g) == ref(g), s"group $g: ${ours(g)} != ${ref(g)}")
  }

  test("matches percentile() bit-for-bit: duplicates, skewed groups, many quantiles") {
    // deterministic pseudo-random data with heavy duplication (small value
    // grid) so ranks straddle repeated values, plus group-size skew
    val data = for {
      i <- 1 to 4000
      g = "g" + (i % 3)
      if g != "g2" || i % 5 == 0 // skewed group sizes
    } yield (g, ((i * 2654435761L) % 97).toDouble / 7.0)
    assertMatchesPercentile(data,
      Seq("q01" -> 0.01, "q25" -> 0.25, "q50" -> 0.5,
        "q90" -> 0.9, "q99" -> 0.99))
  }

  test("matches percentile() at integral rank positions and tiny groups") {
    // 5 values → position q*(n-1) is integral for q in {0, .25, .5, 1}:
    // exercises the no-interpolation special case; 1-value group
    // exercises lower==higher at every q
    val data = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0,
      "a" -> 5.0, "b" -> 42.0)
    assertMatchesPercentile(data,
      Seq("q0" -> 0.0, "q25" -> 0.25, "q50" -> 0.5,
        "q60" -> 0.6, "q100" -> 1.0))
  }

  test("ignores NULLs like percentile() does") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", Some(7.0))).toDF("g", "x")
    val ours = HistQuantile.exactQuantiles(df, "g", "x", Seq("q50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours == Map("a" -> 2.0, "b" -> 7.0))
  }
}
