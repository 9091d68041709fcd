package graft.ops

import graft.SparkSpec

/** Physical-plan regression pins for the scale properties the engine
  * claims (SCALE.md): broadcasts where intended, top-k without a global
  * sort, pushdown/pruning at the scan, and — registry-wide — no
  * cartesian product that isn't an explicitly exact/brute-force oracle
  * twin. A plan regression here is a 100 TB incident that local row
  * counts would never catch.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q_join_broadcast broadcasts the dimension side") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_topk plans TakeOrderedAndProject (no global sort)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("p1_projection prunes the parquet ReadSchema to selected columns") {
    val p = plan("p1_projection")
    val read = "ReadSchema: [^,]*struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("c_name") && !read.contains("c_comment"),
      s"expected pruned ReadSchema, got: $read")
  }

  test("p2_filter pushes the range predicate into the scan") {
    val p = plan("p2_filter")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan"),
      s"expected pushed range filters in:\n$p")
  }

  test("q_bucketed_join joins the bucketed layouts with no shuffle under the join") {
    val p = plan("q_bucketed_join")
    val lines = p.linesIterator.toSeq
    val idx = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(idx >= 0, s"expected a sort-merge join in:\n$p")
    // parents print above children: the agg/sort Exchanges sit ABOVE the
    // join line; anything below it would mean the bucketed layout failed
    // to align the join and a fact-table shuffle crept back in
    assert(!lines.drop(idx).exists(_.contains("Exchange")),
      s"bucketed join must not re-shuffle its inputs:\n$p")
  }

  test("q_partition_pruning prunes to the one matching partition directory") {
    val p = plan("q_partition_pruning")
    assert(p.contains("PartitionFilters: ["),
      s"expected partition filters at the scan:\n$p")
    assert("PartitionFilters: \\[[^\\]]*1-URGENT".r.findFirstIn(p).isDefined,
      s"priority predicate must prune partitions, not post-filter rows:\n$p")
  }

  test("q_dynamic_pruning injects a runtime pruning subquery at the fact scan") {
    val p = plan("q_dynamic_pruning")
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning at the partitioned scan:\n$p")
  }

  test("selective fact⨝fact joins inject a runtime bloom filter") {
    // InjectRuntimeFilter only fires for non-broadcast joins whose
    // application side is big enough; the size thresholds are sized for
    // real clusters, so pin the MECHANISM at fixture scale by lowering
    // them for this test only
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val li = graft.model.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice")
      val ords = graft.model.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      val p = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact side:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no registered query plans an accidental cartesian join") {
    // exact all-pairs / broadcast brute-force forms kept ON PURPOSE as
    // oracle twins of their bucketed scale paths:
    val intentional = Set(
      "x_dedup_embedding",  // exact cross join — twin of x_dedup_embedding_lsh
      "x_knn_cosine",       // broadcast brute force — twin of x_knn_lsh/x_knn_ivf
      "q_approx_distinct",  // 1-row × 1-row aggregate combine — constant work
      "q_approx_percentile", // fact × 1-row sketch broadcast — O(1) inner loop
      "x_ks_drift",         // sources × distinct-lengths CDF grid: BOTH
                            // sides are post-aggregation outputs (never
                            // corpus-scale), the dense grid IS the algorithm
      "st_ks_drift",        // same CDF grid read off the streamed
                            // histogram state (KsDriftIngest.ksPairs)
      "x_daily_drift",      // days × value-buckets CDF grid — same shape
      "x_ann_recall",       // recall EVAL: the ground-truth side is the
                            // deliberate brute-force panel × corpus scan
      "x_knn_classify",     // same panel × corpus ground-truth stance
      "st_cdc_reconcile_repair", // state rows × the 1-row post-repair
                                 // residual count (the q_approx_percentile
                                 // 1-row combine shape) — the resid column
                                 // is the row's proof obligation
      "st_cdc_reconcile_docstore") // same shape: doc rows × the 1-row
                                   // maintained-vs-direct mismatch count
    // iterative/eager queries run real jobs just to build their plan —
    // their join shapes are asserted in their own suites
    val eager = Set("x_dedup_clusters", "x_knn_ivf", "x_knn_ivf_probeall",
      "x_knn_ivf_hashseed", "x_knn_ivfpq", "x_neardup_dedup",
      "x_bpe_train", "x_bpe_encode", "x_pagerank",
      "x_kmeans", "x_pca_power", // Lloyd/power rounds collect mid-build;
                                 // map-only shape pinned in their tests below
      "x_label_prop", // rounds materialize to scratch (PageRank shape);
                      // the per-round plan is pinned below
      "x_minhash_recall", // metric assembly counts both pair pipelines
                          // eagerly; their join shapes are pinned by
                          // x_ngram_jaccard / x_dedup_minhash
      "x_label_purity")   // runs the Lloyd collects mid-build (x_kmeans)
    graft.SparkEntry.queries.keys
      .filterNot(intentional).filterNot(eager).toSeq.sorted
      .foreach { name =>
        val p = plan(name)
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an all-pairs join:\n$p")
      }
  }

  test("k-means assignment pass is map-only (no Exchange)") {
    import org.apache.spark.sql.functions._
    val q = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.sim.KMeansExact.quantizeCol(col("embedding")).as("qv"))
    val cents = Array.fill(8 * 64)(0L)
    val p = graft.sim.KMeansExact.assign(q, cents, 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"assignment must not shuffle — k×dim literals travel in the plan:\n$p")
  }

  test("PCA scatter aggregates map-side before its one shuffle") {
    import org.apache.spark.sql.functions._
    val q = graft.model.Tables.embeddings(spark, sf)
      .select(graft.sim.KMeansExact.quantizeCol(col("embedding")).as("qv"))
    val centered = q.select(zip_with(col("qv"),
      lit(Array.fill(64)(0L)), (a, b) => a - b).as("c"))
    val scatter = centered
      .select(col("c"), posexplode(col("c")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("s"))
    val p = scatter.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"),
      s"dim²-key scatter must partial-aggregate before the exchange:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"scatter should need exactly one shuffle:\n$p")
  }

  test("x_coactivity_capped prunes hot buckets via a broadcast anti join") {
    val p = plan("x_coactivity_capped")
    // the |buckets|-bounded hot set must broadcast back onto the
    // inverted index (NOT EXISTS → broadcast LeftAnti) — a shuffled
    // anti join here would move the corpus to prune a dimension
    val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
    assert(anti.nonEmpty && anti.forall(_.contains("Broadcast")),
      s"hot-bucket prune must be a broadcast anti join:\n$p")
  }

  test("x_anomaly_mad broadcasts the per-group median tables") {
    val p = plan("x_anomaly_mad")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"median and MAD tables must broadcast back onto the stream:\n$p")
  }

  test("label-prop vote round cuts winners under WindowGroupLimit, not SortAggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val l = e.select(col("src").as("id"), col("src").as("label")).distinct()
    val p = graft.ops.LabelPropagation.roundWinners(e, l)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 winner cut should plan per-partition group-limit heaps:\n$p")
    // the rejected max-of-struct form planned SortAggregate (struct
    // buffers are not hash-aggregable) — keep it out
    assert(!p.contains("SortAggregate"),
      s"vote counting must stay hash-aggregated:\n$p")
  }
}
