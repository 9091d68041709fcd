package graft.ops

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {

  test("hand-computed lower medians, MAD, and outlier count") {
    import spark.implicits._
    // group a: values 1,2,3,4,100 → med=3 (idx 3 of 5), devs
    // 2,1,0,1,97 sorted 0,1,1,2,97 → mad=1 (idx 3), outliers: dev>3 → 97
    // group b: values 10,20 → med=10 (lower of 2), devs 0,10 →
    // mad=0 (lower), outliers: dev>0 → one (10>0)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val out = RobustStats.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(out("a") == ((5L, 3.0, 1.0, 1L)), s"got ${out("a")}")
    assert(out("b") == ((2L, 10.0, 0.0, 1L)), s"got ${out("b")}")
  }

  test("nulls are excluded, not counted or ranked") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(5.0))).toDF("g", "v")
    val r = RobustStats.madOutliers(df, "g", "v").head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.0)
  }
}
