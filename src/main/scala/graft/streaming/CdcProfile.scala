package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Continuous column PROFILING on a CDC stream — the
  * [[graft.ops.TableStats.profile]] statistics (row count, null count,
  * exact NDV per column) kept correct over the LIVE table at
  * O(changes) per refresh, completing the Deequ-on-streams family:
  * [[CdcQuality]] maintains the constraint violations, [[CdcQualityKeyed]]
  * the uniqueness/referential checks, this the profile a pipeline
  * reads FIRST.
  *
  * Row and null counts are linear in per-row indicators (the
  * [[CdcQuality]] algebra: insert adds, delete retracts the before
  * image, update retracts-then-adds). Exact NDV is NOT — and the
  * standard streaming answer, a mergeable HLL sketch, cannot RETRACT:
  * a deleted value's sketch contribution is unremovable, so under
  * deletes/updates a sketch only ever over-counts. Exactness under
  * retraction requires keyed state — per (column, value) the live
  * count n — and the NDV delta telescopes exactly like
  * [[CdcQualityKeyed]]'s checks: Δndv = Σ touched values
  * (1[n′>0] − 1[n>0]), so any batching of the log yields the identical
  * profile (spec-pinned). The per-(column, value) state is
  * value-cardinality-sized — the honest price of exact NDV; at
  * sketchable tolerances the cheap path remains an insert-only HLL,
  * which this module deliberately is not.
  *
  * State shape follows [[CdcQualityKeyed]]: one part-tagged write per
  * round (`round_<id>`: netted value counts + this round's
  * column-metric delta partials), batch-id-versioned for at-least-once
  * redelivery; values ride as their CAST-to-string rendering, injective
  * per column for every harness type, so one state table serves any
  * column list.
  */
object CdcProfile {

  /** The monitored stream and the profiled columns of its payload. */
  final case class ProfileSpec(table: String, schema: StructType,
                               cols: Seq[String]) {
    require(cols.nonEmpty, "profile of zero columns")
  }

  /** Landed weighted form: one ±1-weighted row PER (image, column) —
    * (src, seq, c, v: string-rendered nullable value, w). The JSON
    * decode happens exactly once, here.
    */
  def weightedDeltas(changes: DataFrame, spec: ProfileSpec): DataFrame = {
    val ev = changes.filter(col("table") === spec.table)
      .select(col("src"), col("seq"), col("op"),
        from_json(col("payload"), spec.schema).as("a"),
        from_json(col("payload_before"), spec.schema).as("b"))
    def img(side: String, w: Long) = {
      val p = col(side)
      array(spec.cols.map(c => struct(lit(c).as("c"),
        p.getField(c).cast("string").as("v"), lit(w).as("w"))): _*)
    }
    ev.select(col("src"), col("seq"), explode(
        when(col("op") === "insert", img("a", 1L))
          .when(col("op") === "update",
            concat(img("b", -1L), img("a", 1L)))
          .otherwise(img("b", -1L))).as("d"))
      .select(col("src"), col("seq"), col("d.c").as("c"),
        col("d.v").as("v"), col("d.w").as("w"))
  }

  /** One round: netted per-(column, value) counts advanced, and this
    * round's per-column metric deltas (rows, nulls, ndv) — tagged into
    * one write (part 's' = (c, v, n); part 'v' = (c, metric, d)).
    */
  private def writeRound(delta: DataFrame, sPre: DataFrame,
                         outPath: String): Unit = {
    val dVals = delta.filter(col("v").isNotNull)
      .groupBy("c", "v").agg(sum(col("w")).as("dn"))
    val dRows = delta.groupBy("c")
      .agg(sum(col("w")).as("d"))
      .select(col("c"), lit("rows").as("metric"), col("d"))
    val dNulls = delta.filter(col("v").isNull).groupBy("c")
      .agg(sum(col("w")).as("d"))
      .select(col("c"), lit("nulls").as("metric"), col("d"))
    // NDV delta over TOUCHED values only; 1[n>0] is presence — the
    // telescoping contribution function (CdcQualityKeyed's uContrib
    // analog, here a presence indicator)
    def present(n: Column): Column =
      when(coalesce(n, lit(0L)) > 0L, 1L).otherwise(0L)
    val dNdv = dVals.join(sPre, Seq("c", "v"), "left")
      .groupBy("c")
      .agg(coalesce(sum(
        present(coalesce(col("n"), lit(0L)) + col("dn"))
          - present(col("n"))), lit(0L)).as("d"))
      .select(col("c"), lit("ndv").as("metric"), col("d"))
    val sNew = sPre.select(col("c"), col("v"), col("n"))
      .unionAll(dVals.select(col("c"), col("v"), col("dn").as("n")))
      .groupBy("c", "v").agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0L)
    sNew.select(lit("s").as("part"), col("c"), col("v"),
        lit(null).cast("string").as("metric"), col("n").as("a"))
      .unionAll(dRows.unionByName(dNulls).unionByName(dNdv)
        .select(lit("v").as("part"), col("c"),
          lit(null).cast("string").as("v"), col("metric"),
          col("d").as("a")))
      .coalesce(4)
      .write.mode("overwrite").parquet(outPath)
  }

  private def partS(round: DataFrame): DataFrame =
    round.filter(col("part") === "s").select(col("c"), col("v"), col("a").as("n"))
  private def emptyState(delta: DataFrame): DataFrame =
    delta.select(col("c"), col("v"), lit(0L).as("n")).limit(0)

  private def report(spark: SparkSession, partials: DataFrame,
                     spec: ProfileSpec): DataFrame = {
    import spark.implicits._
    val seed = spec.cols.toDF("col_name")
    val agg = partials.groupBy("c", "metric").agg(sum(col("a")).as("t"))
    def metric(m: String) = agg.filter(col("metric") === m)
      .select(col("c").as("col_name"), col("t").as(s"__$m"))
    seed.join(metric("rows"), Seq("col_name"), "left")
      .join(metric("nulls"), Seq("col_name"), "left")
      .join(metric("ndv"), Seq("col_name"), "left")
      .select(col("col_name"),
        coalesce(col("__rows"), lit(0L)).as("n_rows"),
        coalesce(col("__nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("__ndv"), lit(0L)).as("n_distinct"))
      .orderBy("col_name")
  }

  /** Replay the change log through `batches` sequential rounds and
    * return the live profile — batching-invariant (rows/nulls are
    * linear, NDV telescopes). The [[CdcQualityKeyed.maintain]]
    * contract, including `materializeInput`.
    */
  def maintain(changes: DataFrame, batches: Int, spec: ProfileSpec,
               materializeInput: Boolean = true,
               workDir: Option[String] = None): DataFrame = {
    require(batches >= 1, s"need at least one batch, got $batches")
    val spark = changes.sparkSession
    val base = workDir
      .orElse(spark.sparkContext.getCheckpointDir)
      .getOrElse {
        require(spark.sparkContext.isLocal,
          "CdcProfile.maintain on a cluster needs a shared-FS workDir " +
            "— a driver-local temp dir is invisible to executors")
        graft.ops.CoreOps.scratchDirUnique("cdc_profile")
      }
    val scratch =
      s"$base/cdcprof_${java.util.UUID.randomUUID().toString.take(8)}"
    val landed =
      if (!materializeInput) changes
      else {
        weightedDeltas(changes, spec)
          .write.mode("overwrite").parquet(s"$scratch/changes")
        spark.read.parquet(s"$scratch/changes")
      }
    val batched = landed.withColumn("bk",
      pmod(xxhash64(col("src"), col("seq")), lit(batches)))
    (0 until batches).foreach { k =>
      val delta = batched.filter(col("bk") === k)
      val prev =
        if (k == 0) None
        else Some(spark.read.parquet(s"$scratch/round_${k - 1}"))
      val sPre = prev.map(partS).getOrElse(emptyState(landed))
      writeRound(delta, sPre, s"$scratch/round_$k")
    }
    report(spark,
      spark.read.parquet((0 until batches)
          .map(k => s"$scratch/round_$k"): _*)
        .filter(col("part") === "v"), spec)
  }

  // ---- streaming form (the CdcQualityKeyed dir discipline) ----

  /** One micro-batch against the pre-state of batch `id` — the
    * batch-id-versioned redelivery contract; older rounds pruned to
    * their partial rows.
    */
  def applyBatch(batch: DataFrame, stateDir: String, id: Long,
                 spec: ProfileSpec): Unit = {
    val spark = batch.sparkSession
    val (rounds, prev, prevParts) = RoundState.prevRound(spark, stateDir, id)
    val delta = weightedDeltas(batch, spec).persist()
    try {
      val sPre = prevParts.map(partS).getOrElse(emptyState(delta))
      writeRound(delta, sPre, s"$stateDir/round_$id")
    } finally { delta.unpersist(); () }
    RoundState.pruneToViews(spark, stateDir, rounds, prev)
  }

  /** Continuous form over a stream of change rows. */
  def start(changes: DataFrame, stateDir: String, checkpointDir: String,
            spec: ProfileSpec): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, stateDir, id, spec)
      }
      .start()

  /** The live profile at the current stream position — total from
    * batch zero.
    */
  def view(spark: SparkSession, stateDir: String, spec: ProfileSpec)
      : DataFrame = {
    import spark.implicits._
    val dirs = RoundState.deltaDirs(spark, stateDir)
    if (dirs.isEmpty)
      report(spark, spec.cols.toDF("c")
        .select(col("c"), lit("rows").as("metric"), lit(0L).as("a"))
        .limit(0), spec)
    else
      report(spark, spark.read.parquet(dirs: _*)
        .filter(col("part") === "v"), spec)
  }
}
