package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The KEYED half of continuous CDC data-quality — PK uniqueness and
  * referential integrity maintained incrementally, completing
  * [[CdcQuality]] (which covers the row-local checks) so the FULL
  * `TableStats.validate` suite runs at O(changes) per micro-batch with
  * no base-table scan. These two are exactly the checks a CDC pipeline
  * most needs live: duplicate keys mean broken upsert semantics,
  * orphaned foreign keys mean torn application order — the silent
  * corruption the reference's swallowed INSERT errors (sync.py:87-89)
  * produce downstream.
  *
  * Neither check is expressible as a linear sum of per-row indicators
  * (a row is a duplicate or an orphan only relative to OTHER rows), so
  * unlike [[CdcQuality]]'s indicator algebra they need keyed state:
  *
  *   - uniqueness: per declared-unique key value, the live row count n
  *     (Σ ±1 over the change weights). Violations = Σ max(n−1, 0) —
  *     identical to `validate`'s `count(*) − count(DISTINCT key)` over
  *     the live multiset.
  *   - referential: per join-key value, the live fact count fn and live
  *     dim count dn. Violations = Σ fn·[dn = 0] — the anti-join count.
  *
  * Per round, each check's violation DELTA is computed only over the
  * keys the batch touched (new-contribution minus old-contribution,
  * against the previous round's netted state), and the running report
  * is the sum of per-round delta partials. The per-round deltas
  * TELESCOPE — Σ rounds [G(state_after) − G(state_before)] = G(final) —
  * so any partition of the log into batches yields the identical
  * report (spec-pinned at 1/3/5 batches), the [[JoinIvm]] batching-
  * invariance stance reached through a different algebra (these
  * functionals are not bilinear; sequential telescoping replaces
  * bilinearity as the invariance argument).
  *
  * State shape follows [[JoinIvm]]: one part-tagged parquet write per
  * round (`round_<id>` — netted keyed states + this round's ≤|checks|
  * delta partials), versioned by batch id so an at-least-once
  * redelivery rebuilds exactly its own round from the intact previous
  * round. Old rounds are pruned to partial-only `view_<r>` dirs; at a
  * long stream's scale the partial dirs would fold into a compacted
  * base exactly as [[JoinIvm.applyBatch]]'s `viewbase_` machinery does
  * (checks-sized rows; deliberately not duplicated here). The per-round
  * state write is keys-sized — the netted key counts, never data rows.
  * Honest scale note: the SHIPPED state form rewrites the full netted
  * count tables each round (the [[JoinIvm]] stance, accepted there for
  * the same keys-sized-not-data-sized reason); the further cheapening
  * at extreme key cardinality is a bucketed touched-buckets-only
  * layout like [[CdcPipeline.applyBatch]]'s — a design path, not
  * shipped code (its per-key seq-gate redelivery trick is proved on
  * the deferred-JSON applier).
  */
object CdcQualityKeyed {

  /** One monitored fact stream with the full validate-suite check set:
    * row-local checks (the [[CdcQuality]] algebra), one declared-unique
    * key, and one referential check against a dimension CDC stream.
    *
    * @param factTable  CDC `table` tag of the monitored fact stream
    * @param factSchema JSON schema of the fact payload
    * @param rowChecks  row-local checks over the parsed fact payload
    * @param uniqueName check name of the uniqueness check
    * @param uniqueKey  declared-unique key from the parsed fact payload
    *                   (pass a `struct(...)` for composite keys)
    * @param refName    check name of the referential check
    * @param refKey     foreign key from the parsed fact payload
    * @param dimTable   CDC `table` tag of the referenced stream
    * @param dimSchema  JSON schema of the dimension payload
    * @param dimKey     referenced primary key from the parsed dim payload
    */
  final case class KeyedSpec(
      factTable: String, factSchema: StructType,
      rowChecks: Seq[CdcQuality.QCheck],
      uniqueName: String, uniqueKey: Column => Column,
      refName: String, refKey: Column => Column,
      dimTable: String, dimSchema: StructType,
      dimKey: Column => Column) {
    def checkNames: Seq[String] =
      (rowChecks.map(_.name) :+ uniqueName :+ refName).sorted
  }

  /** max(n−1, 0): a key's contribution to the uniqueness violation
    * count (`count(*) − count(DISTINCT)` restated per key).
    */
  private def uContrib(n: Column): Column = greatest(n - 1L, lit(0L))

  /** fn·[dn = 0]: a key's contribution to the referential violation
    * count (live fact rows with no live dim row).
    */
  private def rContrib(fn: Column, dn: Column): Column =
    when(coalesce(dn, lit(0L)) === 0L, coalesce(fn, lit(0L))).otherwise(0L)

  /** The landed weighted-delta form of the two-stream change log (the
    * [[JoinIvm.weightedDeltas]] stance): one ±1-weighted row per image
    * touched, BOTH tables in one table — fact rows (`tab='f'`) carry
    * both keyed derivations and every row-check's signed indicator,
    * dim rows (`tab='d'`) carry the referenced key. The JSON payload
    * decode happens exactly once, here; every maintenance round is
    * pure arithmetic over this.
    */
  def weightedDeltas(changes: DataFrame, spec: KeyedSpec): DataFrame = {
    def exploded(table: String, schema: StructType,
                 mk: (String, Long) => Column): DataFrame =
      changes.filter(col("table") === table)
        .select(col("src"), col("seq"), col("op"),
          from_json(col("payload"), schema).as("a"),
          from_json(col("payload_before"), schema).as("b"))
        .select(col("src"), col("seq"), explode(
            when(col("op") === "insert", array(mk("a", 1L)))
              .when(col("op") === "update", array(mk("b", -1L), mk("a", 1L)))
              .otherwise(array(mk("b", -1L)))).as("d"))
    val f = exploded(spec.factTable, spec.factSchema, (side, w) => {
      val p = col(side)
      struct((Seq(spec.uniqueKey(p).as("ku"), spec.refKey(p).as("kr"),
        lit(w).as("w")) ++
        spec.rowChecks.zipWithIndex.map { case (k, i) =>
          (lit(w) * when(k.violation(p), 1L).otherwise(0L)).as(s"i$i")
        }): _*)
    }).select((Seq(lit("f").as("tab"), col("src"), col("seq"),
      col("d.ku").as("ku"), col("d.kr").as("kr"), col("d.w").as("w")) ++
      spec.rowChecks.indices.map(i => col(s"d.i$i").as(s"i$i"))): _*)
    val kuType = f.schema("ku").dataType
    val krType = f.schema("kr").dataType
    val d = exploded(spec.dimTable, spec.dimSchema, (side, w) => {
      val p = col(side)
      struct(spec.dimKey(p).cast(krType).as("kr"), lit(w).as("w"))
    }).select((Seq(lit("d").as("tab"), col("src"), col("seq"),
      lit(null).cast(kuType).as("ku"), col("d.kr").as("kr"),
      col("d.w").as("w")) ++
      spec.rowChecks.indices.map(i => lit(0L).as(s"i$i"))): _*)
    f.unionAll(d)
  }

  /** One maintenance round: given the batch and the previous round's
    * netted states, the advanced states and this round's per-check
    * violation deltas, tagged into ONE frame (part 'u' = unique-key
    * counts (ku, a=n); 'r' = ref-key counts (kr, a=fn, b=dn); 'v' =
    * check partials (check_name, a=dvi)).
    */
  private def writeRound(delta: DataFrame, uPre: DataFrame, rPre: DataFrame,
                         spec: KeyedSpec, outPath: String): Unit = {
    // `delta` is the round's slice of the landed weighted form: the
    // consumers below are filters + aggregates over it, cheap to re-run
    // per consumer (the JoinIvm maintain stance)
    val fact = delta.filter(col("tab") === "f")
    val dU = fact.groupBy("ku").agg(sum(col("w")).as("du"))
    val dF = fact.groupBy("kr").agg(sum(col("w")).as("dfn"))
    val dD = delta.filter(col("tab") === "d")
      .groupBy("kr").agg(sum(col("w")).as("ddn"))
    val dR = dF.join(dD, Seq("kr"), "full_outer")
      .select(col("kr"), coalesce(col("dfn"), lit(0L)).as("dfn"),
        coalesce(col("ddn"), lit(0L)).as("ddn"))

    // violation deltas over TOUCHED keys only: new minus old contribution
    val uTouched = dU.join(uPre, Seq("ku"), "left")
      .select((coalesce(col("n"), lit(0L)) + col("du")).as("n1"),
        coalesce(col("n"), lit(0L)).as("n0"))
    val dViolU = uTouched
      .agg(coalesce(sum(uContrib(col("n1")) - uContrib(col("n0"))), lit(0L))
        .as("dvi"))
      .select(lit(spec.uniqueName).as("check_name"), col("dvi"))
    val rTouched = dR.join(rPre, Seq("kr"), "left")
      .select((coalesce(col("fn"), lit(0L)) + col("dfn")).as("fn1"),
        (coalesce(col("dn"), lit(0L)) + col("ddn")).as("dn1"),
        coalesce(col("fn"), lit(0L)).as("fn0"),
        coalesce(col("dn"), lit(0L)).as("dn0"))
    val dViolR = rTouched
      .agg(coalesce(sum(rContrib(col("fn1"), col("dn1"))
          - rContrib(col("fn0"), col("dn0"))), lit(0L)).as("dvi"))
      .select(lit(spec.refName).as("check_name"), col("dvi"))
    val dViolRows = {
      val sums = spec.rowChecks.zipWithIndex.map { case (k, i) =>
        coalesce(sum(col(s"i$i")), lit(0L)).as(s"s$i") }
      fact.agg(sums.head, sums.tail: _*)
        .select(explode(array(spec.rowChecks.zipWithIndex.map {
          case (k, i) => struct(lit(k.name).as("check_name"),
            col(s"s$i").as("dvi"))
        }: _*)).as("p")).select(col("p.*"))
    }

    // advanced netted states (zero-count keys drop out; they contribute
    // nothing and a revisiting key restarts from 0 identically)
    val uState = uPre.select(col("ku"), col("n"))
      .unionAll(dU.select(col("ku"), col("du").as("n")))
      .groupBy("ku").agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0L)
    val rState = rPre.select(col("kr"), col("fn"), col("dn"))
      .unionAll(dR.select(col("kr"), col("dfn").as("fn"),
        col("ddn").as("dn")))
      .groupBy("kr").agg(sum(col("fn")).as("fn"), sum(col("dn")).as("dn"))
      .filter(col("fn") =!= 0L || col("dn") =!= 0L)

    val kuType = uState.schema("ku").dataType
    val krType = rState.schema("kr").dataType
    def tag(part: String, checkName: Column, ku: Column, kr: Column,
            a: Column, b: Column)(df: DataFrame): DataFrame =
      df.select(lit(part).as("part"), checkName.as("check_name"),
        ku.cast(kuType).as("ku"), kr.cast(krType).as("kr"),
        a.as("a"), b.as("b"))
    val nullS = lit(null).cast("string")
    tag("u", nullS, col("ku"), lit(null).cast(krType), col("n"),
        lit(null).cast("long"))(uState)
      .unionAll(tag("r", nullS, lit(null).cast(kuType), col("kr"),
        col("fn"), col("dn"))(rState))
      .unionAll(tag("v", col("check_name"), lit(null).cast(kuType),
        lit(null).cast(krType), col("dvi"), lit(null).cast("long"))(
        dViolRows.unionByName(dViolU).unionByName(dViolR)))
      .coalesce(4)
      .write.mode("overwrite").parquet(outPath)
  }

  private def partU(round: DataFrame): DataFrame =
    round.filter(col("part") === "u").select(col("ku"), col("a").as("n"))
  private def partR(round: DataFrame): DataFrame =
    round.filter(col("part") === "r")
      .select(col("kr"), col("a").as("fn"), col("b").as("dn"))

  private def emptyStates(deltas: DataFrame): (DataFrame, DataFrame) =
    (deltas.select(col("ku"), lit(0L).as("n")).limit(0),
     deltas.select(col("kr"), lit(0L).as("fn"), lit(0L).as("dn")).limit(0))

  private def report(spark: SparkSession, partials: DataFrame,
                     spec: KeyedSpec): DataFrame = {
    import spark.implicits._
    val seed = spec.checkNames.toDF("check_name")
    seed.join(partials.groupBy("check_name").agg(sum(col("a")).as("v")),
        Seq("check_name"), "left")
      .select(col("check_name"),
        coalesce(col("v"), lit(0L)).as("violations"))
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy("check_name")
  }

  /** Replay the change log through `batches` sequential rounds and
    * return the full quality report — the oracle-gated form. Batches
    * split by a hash of (src, seq); the telescoping identity makes the
    * report invariant to the split. On a cluster pass a shared-FS
    * `workDir` (the [[JoinIvm.maintain]] contract).
    */
  def maintain(changes: DataFrame, batches: Int, spec: KeyedSpec,
               materializeInput: Boolean = true,
               workDir: Option[String] = None): DataFrame = {
    require(batches >= 1, s"need at least one batch, got $batches")
    val spark = changes.sparkSession
    val base = workDir
      .orElse(spark.sparkContext.getCheckpointDir)
      .getOrElse {
        require(spark.sparkContext.isLocal,
          "CdcQualityKeyed.maintain on a cluster needs a shared-FS " +
            "workDir — a driver-local temp dir is invisible to executors")
        graft.ops.CoreOps.scratchDirUnique("cdc_quality_keyed")
      }
    val scratch =
      s"$base/cdcqk_${java.util.UUID.randomUUID().toString.take(8)}"
    // land the weighted-delta form ONCE (one JSON decode, ever); pass
    // materializeInput=false when `changes` is ALREADY that landed form
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
      val (u0, r0) = emptyStates(landed)
      val uPre = prev.map(partU).getOrElse(u0)
      val rPre = prev.map(partR).getOrElse(r0)
      writeRound(delta, uPre, rPre, spec, s"$scratch/round_$k")
    }
    report(spark,
      spark.read.parquet((0 until batches)
          .map(k => s"$scratch/round_$k"): _*)
        .filter(col("part") === "v"), spec)
  }

  // ---- streaming form: batch-id-versioned rounds, Hadoop-FS discovery ----

  /** Heal an interrupted prune swap, then list state-carrying rounds —
    * the [[JoinIvm.applyBatch]] recovery stance (Hadoop FS throughout;
    * `java.io.File` on a cluster stateDir silently reads "no state").
    */
  /** One micro-batch against the pre-state of batch `id`, written
    * entirely under `round_<id>` — an at-least-once redelivery rebuilds
    * exactly its own round from the intact previous round. Rounds older
    * than the previous are pruned to their partial rows (`view_<r>`),
    * keeping the pre-state candidate set O(1) per batch.
    */
  def applyBatch(batch: DataFrame, stateDir: String, id: Long,
                 spec: KeyedSpec): Unit = {
    val spark = batch.sparkSession
    val (rounds, prev, prevParts) = RoundState.prevRound(spark, stateDir, id)
    // decode the micro-batch once; the round's consumers share the cache
    val delta = weightedDeltas(batch, spec).persist()
    try {
      val (u0, r0) = emptyStates(delta)
      val uPre = prevParts.map(partU).getOrElse(u0)
      val rPre = prevParts.map(partR).getOrElse(r0)
      writeRound(delta, uPre, rPre, spec, s"$stateDir/round_$id")
    } finally { delta.unpersist(); () }
    RoundState.pruneToViews(spark, stateDir, rounds, prev)
  }

  /** Continuous form over a stream of change rows. */
  def start(changes: DataFrame, stateDir: String, checkpointDir: String,
            spec: KeyedSpec): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, stateDir, id, spec)
      }
      .start()

  /** The live full-suite quality report at the current stream position
    * — total from batch zero (the [[CdcQuality.view]] contract).
    */
  def view(spark: SparkSession, stateDir: String, spec: KeyedSpec)
      : DataFrame = {
    import spark.implicits._
    val dirs = RoundState.deltaDirs(spark, stateDir)
    if (dirs.isEmpty)
      report(spark, spec.checkNames.toDF("check_name")
        .select(col("check_name"), lit(0L).as("a")).limit(0), spec)
    else
      report(spark, spark.read.parquet(dirs: _*)
        .filter(col("part") === "v"), spec)
  }
}
