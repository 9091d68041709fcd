package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JOIN-view incremental maintenance over TWO CDC streams — the
  * canonical hard case of materialized-view maintenance, solved with
  * the bilinear delta rule over weighted multisets (the algebra of
  * differential dataflow / DBSP; Budiu et al., "DBSP: Automatic
  * Incremental View Maintenance for Rich Query Languages",
  * VLDB 2023, and McSherry et al., "Differential dataflow", CIDR 2013):
  *
  *   Δ(O ⋈ L) = ΔO ⋈ L_pre  +  O_pre ⋈ ΔL  +  ΔO ⋈ ΔL
  *
  * where every change event is an independent ±1-weighted row (insert
  * +after, delete −before, update −before +after — the binlog source's
  * `payload`/`payload_before` pair) and aggregates are weighted sums.
  * Bilinearity makes the formula EXACT for any partition of the log
  * into batches, in any per-batch event order — which is why
  * [[maintain]] batches by a HASH of (src, seq) instead of a global
  * sort: batching is a free parameter, not a correctness obligation,
  * and the spec proves it (1 batch ≡ 4 ≡ 7, all ≡ the direct join over
  * final live states).
  *
  * Per batch the work is |ΔO|+|ΔL| joined against key-netted states
  * (O: one row per live order; L: per-orderkey count/sum partials) —
  * O(changes · state-lookup), never a re-join of the base tables,
  * which is the entire point: the reference refreshes any downstream
  * join by re-copying both tables (sync.py:185-200); this maintains
  * the view for the cost of the deltas. Money sums ride
  * DECIMAL(28,6) so retractions cancel bit-exactly.
  *
  * States materialize per round to scratch (the PageRank stance:
  * iterative lineage must not chain; pass a shared-FS dir on a
  * cluster).
  */
object JoinIvm {

  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderpriority", StringType)))

  /** `l_extendedprice` arrives as the payload's QUOTED scale-exact
    * decimal string (the render the reference battles for) — cast back
    * to DECIMAL, exactly.
    */
  val lineSchema: StructType = StructType(Seq(
    StructField("l_id", LongType),
    StructField("l_orderkey", LongType),
    StructField("l_extendedprice", StringType)))

  /** ±1-weighted order rows: (okey, pr, w). */
  def orderDeltas(changes: DataFrame): DataFrame = {
    val ev = changes.filter(col("table") === "orders_cdc")
      .select(col("op"),
        from_json(col("payload"), orderSchema).as("a"),
        from_json(col("payload_before"), orderSchema).as("b"))
    val add = struct(col("a.o_orderkey").as("okey"),
      col("a.o_orderpriority").as("pr"), lit(1L).as("w"))
    val retract = struct(col("b.o_orderkey").as("okey"),
      col("b.o_orderpriority").as("pr"), lit(-1L).as("w"))
    ev.select(explode(
        when(col("op") === "insert", array(add))
          .when(col("op") === "update", array(retract, add))
          .otherwise(array(retract))).as("d"))
      .select(col("d.okey").as("okey"), col("d.pr").as("pr"),
        col("d.w").as("w"))
  }

  /** Per-orderkey weighted lineitem partials: (okey, dn, ds). Lineitem
    * changes in the fixture are insert/delete only, but the update arm
    * is the same retract-then-add as orders.
    */
  def lineDeltas(changes: DataFrame): DataFrame = {
    val price = (side: String) =>
      col(s"$side.l_extendedprice").cast("decimal(28,6)")
    val ev = changes.filter(col("table") === "lineitem_cdc")
      .select(col("op"),
        from_json(col("payload"), lineSchema).as("a"),
        from_json(col("payload_before"), lineSchema).as("b"))
    val add = struct(col("a.l_orderkey").as("okey"), lit(1L).as("w"),
      price("a").as("p"))
    val retract = struct(col("b.l_orderkey").as("okey"), lit(-1L).as("w"),
      (-price("b")).as("p"))
    ev.select(explode(
        when(col("op") === "insert", array(add))
          .when(col("op") === "update", array(retract, add))
          .otherwise(array(retract))).as("d"))
      .groupBy(col("d.okey").as("okey"))
      .agg(sum(col("d.w")).as("dn"),
        sum(col("d.p")).cast("decimal(28,6)").as("ds"))
  }

  import org.apache.spark.sql.types.DecimalType
  private val oStateSchema = StructType(Seq(
    StructField("okey", LongType), StructField("pr", StringType),
    StructField("w", LongType)))
  private val lStateSchema = StructType(Seq(
    StructField("okey", LongType), StructField("n", LongType),
    StructField("s", DecimalType(28, 6))))

  /** One maintenance round against the PRE-state of micro-batch `id`,
    * written entirely under `id`-keyed paths: `o_<id>`, `l_<id>`,
    * `view/round_<id>` — so an at-least-once redelivery of batch `id`
    * (foreachBatch's contract after a crash) rebuilds exactly its own
    * round from the same pre-state, byte-deterministically. That is
    * the whole exactly-once story: state is VERSIONED by batch, never
    * mutated in place.
    */
  def applyBatch(batch: DataFrame, stateDir: String, id: Long): Unit = {
    val spark = batch.sparkSession
    def stateRounds: Seq[Long] = {
      val d = new java.io.File(stateDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("o_"))
        .flatMap(_.getName.stripPrefix("o_").toLongOption).toSeq.sorted
    }
    val prev = stateRounds.filter(_ < id).lastOption
    val oPre = prev.map(p => spark.read.parquet(s"$stateDir/o_$p"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], oStateSchema))
    val lPre = prev.map(p => spark.read.parquet(s"$stateDir/l_$p"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], lStateSchema))
    val dO = orderDeltas(batch).persist()
    val dL = lineDeltas(batch).persist()
    val t1 = dO.join(lPre, "okey")
      .select(col("pr"), (col("w") * col("n")).as("dn"),
        (col("w") * col("s")).cast("decimal(28,6)").as("ds"))
    val t2 = oPre.join(dL, "okey")
      .select(col("pr"), (col("w") * col("dn")).as("dn"),
        (col("w") * col("ds")).cast("decimal(28,6)").as("ds"))
    val t3 = dO.join(dL, "okey")
      .select(col("pr"), (col("w") * col("dn")).as("dn"),
        (col("w") * col("ds")).cast("decimal(28,6)").as("ds"))
    t1.unionAll(t2).unionAll(t3)
      .write.mode("overwrite").parquet(s"$stateDir/view/round_$id")
    oPre.unionAll(dO).groupBy("okey", "pr")
      .agg(sum(col("w")).as("w")).filter(col("w") =!= 0)
      .write.mode("overwrite").parquet(s"$stateDir/o_$id")
    lPre.select(col("okey"), col("n").as("dn"), col("s").as("ds"))
      .unionAll(dL).groupBy("okey")
      .agg(sum(col("dn")).as("n"),
        sum(col("ds")).cast("decimal(28,6)").as("s"))
      .filter(col("n") =!= 0 || col("s") =!= lit(0))
      .write.mode("overwrite").parquet(s"$stateDir/l_$id")
    dO.unpersist(); dL.unpersist()
    // prune states older than the previous round — `prev` must survive
    // so a redelivery of THIS batch can rebuild from it
    stateRounds.filter(r => prev.exists(r < _)).foreach { r =>
      def rm(p: String): Unit = {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(path, true): Unit
      }
      rm(s"$stateDir/o_$r"); rm(s"$stateDir/l_$r")
    }
  }

  /** Structured Streaming form: maintain the join view continuously
    * over a stream of change rows (the binlog source's columns).
    */
  def start(changes: DataFrame, stateDir: String,
            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, stateDir, id)
      }
      .start()

  /** The maintained view at the current stream position. */
  def view(spark: org.apache.spark.sql.SparkSession,
           stateDir: String): DataFrame = {
    val d = new java.io.File(s"$stateDir/view")
    val rounds = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getPath)
    spark.read.parquet(rounds.toIndexedSeq: _*)
      .groupBy(col("pr").as("o_orderpriority"))
      .agg(sum(col("dn")).as("n_items"),
        sum(col("ds")).cast("double").as("sum_price"))
      .filter(col("n_items") > 0)
  }

  /** The landed form of the change stream a real pipeline materializes
    * once: one ±1-weighted delta row per image touched, both tables
    * tagged in one table — `(tab, src, seq, okey, pr, w, p)` with
    * `pr` null for lineitem rows and `p` (the signed price) null for
    * order rows. Every maintenance consumer is pure arithmetic over
    * this; the JSON payload decode happens exactly once, here.
    */
  def weightedDeltas(changes: DataFrame): DataFrame = {
    val o = {
      val ev = changes.filter(col("table") === "orders_cdc")
        .select(col("src"), col("seq"), col("op"),
          from_json(col("payload"), orderSchema).as("a"),
          from_json(col("payload_before"), orderSchema).as("b"))
      val add = struct(col("a.o_orderkey").as("okey"),
        col("a.o_orderpriority").as("pr"), lit(1L).as("w"))
      val retract = struct(col("b.o_orderkey").as("okey"),
        col("b.o_orderpriority").as("pr"), lit(-1L).as("w"))
      ev.select(col("src"), col("seq"), explode(
          when(col("op") === "insert", array(add))
            .when(col("op") === "update", array(retract, add))
            .otherwise(array(retract))).as("d"))
        .select(lit("o").as("tab"), col("src"), col("seq"),
          col("d.okey").as("okey"), col("d.pr").as("pr"),
          col("d.w").as("w"), lit(null).cast("decimal(28,6)").as("p"))
    }
    val l = {
      val price = (side: String) =>
        col(s"$side.l_extendedprice").cast("decimal(28,6)")
      val ev = changes.filter(col("table") === "lineitem_cdc")
        .select(col("src"), col("seq"), col("op"),
          from_json(col("payload"), lineSchema).as("a"),
          from_json(col("payload_before"), lineSchema).as("b"))
      val add = struct(col("a.l_orderkey").as("okey"), lit(1L).as("w"),
        price("a").as("p"))
      val retract = struct(col("b.l_orderkey").as("okey"), lit(-1L).as("w"),
        (-price("b")).as("p"))
      ev.select(col("src"), col("seq"), explode(
          when(col("op") === "insert", array(add))
            .when(col("op") === "update", array(retract, add))
            .otherwise(array(retract))).as("d"))
        .select(lit("l").as("tab"), col("src"), col("seq"),
          col("d.okey").as("okey"),
          lit(null).cast("string").as("pr"),
          col("d.w").as("w"), col("d.p").as("p"))
    }
    o.unionAll(l)
  }

  /** Replay the change log through `batches` maintenance rounds and
    * return the maintained view: per order priority, the live joined
    * pair count and price sum. Pass `materializeInput = false` when
    * `changes` is ALREADY a landed [[weightedDeltas]] table.
    */
  def maintain(changes: DataFrame, batches: Int,
               materializeInput: Boolean = true): DataFrame = {
    require(batches >= 1, s"need at least one batch, got $batches")
    val spark = changes.sparkSession
    val scratch = graft.ops.CoreOps.scratchDirUnique("join_ivm")
    // land the weighted deltas ONCE: the rounds are arithmetic over
    // this table; without it each round would re-run the upstream
    // source (for a binlog input, a full wire re-decode per round)
    val deltas =
      if (!materializeInput) changes
      else {
        weightedDeltas(changes)
          .write.mode("overwrite").parquet(s"$scratch/changes")
        spark.read.parquet(s"$scratch/changes")
      }
    val batched = deltas.withColumn("bk",
      pmod(xxhash64(col("src"), col("seq")), lit(batches)))
    def materialize(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$scratch/$name")
      spark.read.parquet(s"$scratch/$name")
    }
    var oState = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], oStateSchema)
    var lState = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], lStateSchema)
    (0 until batches).foreach { k =>
      val delta = batched.filter(col("bk") === k)
      // dO/dL stay lazy: their lineage is a filter over the landed
      // delta table, cheaper to re-run per consumer than to write two
      // more per-round tables
      val dO = delta.filter(col("tab") === "o")
        .select(col("okey"), col("pr"), col("w"))
      val dL = delta.filter(col("tab") === "l")
        .groupBy(col("okey"))
        .agg(sum(col("w")).as("dn"),
          sum(col("p")).cast("decimal(28,6)").as("ds"))
      val oPre = oState
      val lPre = lState
      // Δview = ΔO⋈L_pre + O_pre⋈ΔL + ΔO⋈ΔL, all keyed on okey
      val t1 = dO.join(lPre, "okey")
        .select(col("pr"), (col("w") * col("n")).as("dn"),
          (col("w") * col("s")).cast("decimal(28,6)").as("ds"))
      val t2 = oPre.join(dL, "okey")
        .select(col("pr"), (col("w") * col("dn")).as("dn"),
          (col("w") * col("ds")).cast("decimal(28,6)").as("ds"))
      val t3 = dO.join(dL, "okey")
        .select(col("pr"), (col("w") * col("dn")).as("dn"),
          (col("w") * col("ds")).cast("decimal(28,6)").as("ds"))
      // per-round outputs are group/state-sized, not data-sized —
      // coalesce to a handful of files so 4 rounds don't write
      // 4×3×|shuffle partitions| tiny parquet parts
      t1.unionAll(t2).unionAll(t3).coalesce(1)
        .write.mode("overwrite").parquet(s"$scratch/view/round_$k")
      // advance the states: net per key, drop zero-weight rows
      oState = materialize(
        oPre.unionAll(dO).groupBy("okey", "pr")
          .agg(sum(col("w")).as("w")).filter(col("w") =!= 0)
          .coalesce(4), s"o_$k")
      lState = materialize(
        lPre.select(col("okey"), col("n").as("dn"), col("s").as("ds"))
          .unionAll(dL).groupBy("okey")
          .agg(sum(col("dn")).as("n"),
            sum(col("ds")).cast("decimal(28,6)").as("s"))
          .filter(col("n") =!= 0 || col("s") =!= lit(0))
          .coalesce(4), s"l_$k")
    }
    spark.read.parquet(
        (0 until batches).map(k => s"$scratch/view/round_$k"): _*)
      .groupBy(col("pr").as("o_orderpriority"))
      .agg(sum(col("dn")).as("n_items"),
        sum(col("ds")).cast("double").as("sum_price"))
      .filter(col("n_items") > 0)
  }
}
