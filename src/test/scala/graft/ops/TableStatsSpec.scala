package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TableStats.{Check, DateCol, NumCol, StrCol}

class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, ndv, typed min/max on a known frame") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (2L, Some(4.0), None),
      (3L, Some(2.5), Some("c"))).toDF("id", "v", "s")
    val p = TableStats.profile(df,
      Seq("id" -> NumCol, "v" -> NumCol, "s" -> StrCol))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 3)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    val v = p("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 2.5 && v.getDouble(5) == 4.0)
    val s = p("s")
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("profile: date kind renders ISO day strings") {
    val df = Seq("2021-03-04 10:00:00", "2019-01-31 23:59:59")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val p = TableStats.profile(df, Seq("ts" -> DateCol)).collect()(0)
    assert(p.getString(6) == "2019-01-31" && p.getString(7) == "2021-03-04")
  }

  test("profile plans one column-pruned branch per column, no Expand") {
    // parquet-backed so pruning is visible in the scan's ReadSchema
    val dir = graft.ops.CoreOps.scratchDirUnique("profile_spec")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    val p = TableStats.profile(spark.read.parquet(dir),
      Seq("id" -> NumCol, "s" -> StrCol))
    val plan = p.queryExecution.executedPlan.toString
    // no Expand anywhere: each branch's single count(DISTINCT) is a
    // plain two-level aggregate (the fused form's Expand widened every
    // row k+1x — measured 25.6 s vs ~3 s at sf0.1)
    assert(!plan.contains("Expand"), plan)
    // each branch's parquet scan reads exactly its one column
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.size == 2 && schemas.forall(!_.contains(",")),
      s"branch scans not single-column: $schemas")
  }

  test("validate: row checks, uniqueness, and referential fuse correctly") {
    val fact = Seq((1L, 1, 10.0), (1L, 2, -5.0), (1L, 2, 60.0), (9L, 1, 3.0))
      .toDF("k", "ln", "amt")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = TableStats.validate(fact,
      rowChecks = Seq(
        Check("amt_non_negative", col("amt") < 0.0),
        Check("amt_range", col("amt") < 0.0 || col("amt") > 50.0)),
      uniqueKeys = Seq("pk_unique" -> Seq("k", "ln")),
      refChecks = Seq(("k_ref", col("k"), dim, col("dk"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    assert(out == Seq(
      ("amt_non_negative", 1L, false),
      ("amt_range", 2L, false),
      ("k_ref", 1L, false),
      ("pk_unique", 1L, false)))
  }

  test("validate: a refs-only suite works (no fused branch to build)") {
    val fact = Seq(1L, 2L, 9L).toDF("k")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = TableStats.validate(fact, rowChecks = Nil,
      refChecks = Seq(("k_ref", col("k"), dim, col("dk"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("k_ref", 1L, false)))
  }

  test("validate: all-green suite reports passed=true everywhere") {
    val fact = Seq((1L, 1), (1L, 2)).toDF("k", "ln")
    val out = TableStats.validate(fact,
      rowChecks = Seq(Check("k_not_null", col("k").isNull)),
      uniqueKeys = Seq("pk" -> Seq("k", "ln")))
      .collect()
    assert(out.forall(_.getBoolean(2)))
  }

  test("groupedOls recovers an exact line and flags degenerate groups") {
    // y = 3x + 7 exactly on the cent grid → slope 3, intercept 7, r2 1
    val pts = (1 to 50).map(i => ("g", i.toDouble, 3.0 * i + 7.0)) ++
      Seq(("flat", 2.0, 5.0), ("flat", 2.0, 9.0)) // zero x-variance
    val out = TableStats.groupedOls(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(math.abs(g.getDouble(2) - 3.0) < 1e-12)
    assert(math.abs(g.getDouble(3) - 7.0) < 1e-12)
    assert(math.abs(g.getDouble(4) - 1.0) < 1e-12)
    val flat = out("flat")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4))
  }

  test("groupedOls is partitioning-invariant (exact grid sums)") {
    val pts = (1 to 200).map(i =>
      ("g", (i % 37).toDouble + 0.25, ((i * 13) % 101).toDouble))
    val df1 = pts.toDF("g", "x", "y").repartition(1)
    val df7 = pts.toDF("g", "x", "y").repartition(7)
    val a = TableStats.groupedOls(df1, "g", "x", "y").collect()(0)
    val b = TableStats.groupedOls(df7, "g", "x", "y").collect()(0)
    assert(a.getDouble(2) == b.getDouble(2)) // bit-equal, not approx
    assert(a.getDouble(3) == b.getDouble(3))
    assert(a.getDouble(4) == b.getDouble(4))
  }

  test("corrPairs: perfect positive and negative correlation, one pass") {
    val df = (1 to 40).map(i =>
      (i.toDouble, 2.0 * i + 1.0, -3.0 * i + 5.0)).toDF("a", "b", "c")
    val out = TableStats.corrPairs(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c")) + 1.0) < 1e-12)
    assert(math.abs(out(("b", "c")) + 1.0) < 1e-12)
    val scans = TableStats.corrPairs(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l
      }
    assert(scans.size == 1)
  }

  test("corrPairs: constant column yields NULL corr, not NaN") {
    val df = (1 to 10).map(i => (i.toDouble, 4.0)).toDF("a", "b")
    val out = TableStats.corrPairs(df, Seq("a", "b")).collect()(0)
    assert(out.isNullAt(2))
  }

  test("kAnonymity counts classes and risk rows below each threshold") {
    // QI classes: (a,x)×3, (a,y)×1, (b,x)×2 → sizes {3,1,2}
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("q1", "q2")
    val out = TableStats.kAnonymity(df, Seq(col("q1"), col("q2")),
      Seq(2, 3, 5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) == (1L, 1L))  // only the singleton class
    assert(out(3L) == (2L, 3L))  // sizes 1 and 2
    assert(out(5L) == (3L, 6L))  // everything
  }

  test("kAnonymity: no class below k reports zeros, not nulls") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3)).toDF("q", "v")
    val out = TableStats.kAnonymity(df, Seq(col("q")), Seq(2)).collect()(0)
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L)
  }

  test("lDiversity flags classes whose sensitive values collapse") {
    // class (a): 3 rows, 1 sensitive value — k-anonymous but 1-diverse;
    // class (b): 2 rows, 2 values — 2-diverse
    val df = Seq(("a", "s1"), ("a", "s1"), ("a", "s1"),
      ("b", "s1"), ("b", "s2")).toDF("q", "sv")
    val out = TableStats.lDiversity(df, Seq(col("q")), col("sv"), Seq(2, 3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) == (1L, 3L)) // only class a is under-diverse at l=2
    assert(out(3L) == (2L, 5L)) // both classes below l=3
  }

  test("keySkew flags the hot key with exact integer advisories") {
    // k1: one key holds 8 of 10 rows; k2: uniform over 5 keys
    val rows = (Seq.fill(8)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, (i % 5).toLong) }
    val out = TableStats.keySkew(rows.toDF("k1", "k2"), Seq("k1", "k2"))
      .collect().map(r => r.getString(0) -> r).toMap
    val hot = out("k1")
    assert(hot.getLong(1) == 10 && hot.getLong(2) == 3 &&
      hot.getLong(3) == 8)
    assert(hot.getLong(4) == 800000) // 8/10 in ppm
    assert(hot.getLong(5) == 2666)   // avg = 10 DIV 3 = 3 → 8000 DIV 3
    val uni = out("k2")
    assert(uni.getLong(2) == 5 && uni.getLong(3) == 2 &&
      uni.getLong(4) == 200000 && uni.getLong(5) == 1000)
  }
}
