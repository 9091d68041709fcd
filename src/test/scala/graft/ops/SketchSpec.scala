package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the frequency-sketch and DF-filter operators
  * (their cross-engine hash-match lives in the driver's oracle gate;
  * these assert the CONTRACTS the queries claim).
  */
class SketchSpec extends SparkSpec {

  test("x_cm_sketch never underestimates and is exact sans collisions") {
    val out = graft.Queries.queries("x_cm_sketch")(spark, sf).cache()
    // the CM guarantee: every estimate >= the exact count
    assert(out.filter(!col("never_underestimates")).count() == 0)
    // estimates equal exact counts wherever no word shares all d
    // buckets — on the tiny sf0.001 vocabulary most words collide in
    // at most some rows, so at least one word must estimate exactly
    assert(out.filter(col("n_est") === col("n_exact")).count() > 0)
    out.unpersist()
  }

  test("x_boilerplate_df removes high-DF spans from every document") {
    import graft.functions.TextFunctions
    import graft.model.Tables
    val out = graft.Queries.queries("x_boilerplate_df")(spark, sf)
    val rows = out.select("n_spans", "n_kept", "cleaned_text").collect()
    // every document survives with a row, kept <= total per doc
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) <= r.getLong(0)))
    // recompute span DFs independently and check the rule end-to-end:
    // kept-per-doc == spans whose df <= threshold (removed from ALL
    // docs above it — the C4 rule, vs span_dedup's keep-first)
    val toks = TextFunctions.tokens(col("text"))
    val spans = Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          ceil(size(col("w")) / lit(8.0)).cast("int") - 1)).as("cid"),
        col("w"))
      .select(col("doc_id"),
        array_join(slice(col("w"), col("cid") * 8 + 1, lit(8)), " ").as("span"))
    val df = spans.groupBy("span").agg(countDistinct("doc_id").as("df"))
    val expected = spans.join(df, "span")
      .groupBy("doc_id")
      .agg(sum(when(col("df") <= 2, 1L).otherwise(0L)).as("exp_kept"))
    val joined = out.join(expected, "doc_id")
    assert(joined.filter(col("n_kept") =!= col("exp_kept")).count() == 0)
  }

  test("x_ks_drift emits one bounded statistic per source pair") {
    val out = graft.Queries.queries("x_ks_drift")(spark, sf)
    val rows = out.collect()
    val nSources = graft.model.Tables.documents(spark, sf)
      .select("source").distinct().count()
    // one row per unordered pair, and 0 <= ks_num <= n_a*n_b (the KS
    // statistic ks_num/(n_a*n_b) lives in [0, 1])
    assert(rows.length == nSources * (nSources - 1) / 2)
    assert(rows.forall { r =>
      val ks = r.getAs[Double]("ks_num")
      ks >= 0.0 && ks <= r.getAs[Long]("n_a").toDouble * r.getAs[Long]("n_b")
    })
  }

  test("x_daily_drift emits one bounded statistic per adjacent-day pair") {
    val out = graft.Queries.queries("x_daily_drift")(spark, sf)
    val rows = out.collect()
    val nDays = graft.model.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions
        .date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(rows.length == nDays - 1)
    assert(rows.forall { r =>
      val ks = r.getAs[Double]("ks_num")
      ks >= 0.0 && ks <= r.getAs[Long]("n_a").toDouble * r.getAs[Long]("n_b")
    })
  }
}
