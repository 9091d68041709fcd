package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{CdcPipeline, ChangeEvent}

/** Apply-side CDC throughput (the other half of `CdcBench`'s decode
  * numbers, the docs/SCALE.md "apply cost model" rows): measure
  * `CdcPipeline.applyBatch` against a seeded parquet state and surface
  * the cost model explicitly —
  *
  *   t(batch) ≈ c_fix · touched + c_row · touched · S/B
  *
  * (touched = buckets the batch's keys hash into, S = state rows, B =
  * recorded bucket count). Two legs:
  *
  *  - bucket-count knob: same state size and batch, B swept — shows
  *    WHY [[CdcPipeline.rebucket]] exists: the per-batch rewrite
  *    volume is touched · S/B, so B must track S to keep apply cost
  *    proportional to the batch, and the sweep shows the c_fix
  *    counterweight (more touched buckets = more swap overhead).
  *  - state-size leg: B and batch fixed, S swept — the honest
  *    statement that a batch whose keys span all buckets pays O(S/B)
  *    per bucket, i.e. apply cost grows with state UNLESS B grows
  *    with it (the rebucket discipline).
  *
  * Usage: `sbt "runMain graft.tools.CdcApplyBench"` — one JSON line
  * per cell, min-of-3 warm applies on a fresh state copy each run
  * (apply mutates; reusing a state would measure a different merge).
  */
object CdcApplyBench {

  private def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("cdc-apply-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_applybench_").toString

    def seedState(dir: String, s: Long, buckets: Int): Unit = {
      val rows = spark.range(s).select(
        lit("insert").as("op"), lit("t").as("table"), col("id").as("key"),
        lit(ts(0)).as("ts"), col("id").as("seq"),
        concat(lit("""{"v":"""), col("id"), lit("}")).as("payload"))
      CdcPipeline.applyBatch(spark, rows, dir, numBuckets = buckets)
    }

    def batchOf(n: Int, s: Long, seqBase: Long): DataFrame = {
      val rng = new scala.util.Random(41 + seqBase)
      val keys = Array.fill(n)(math.floorMod(rng.nextLong(), s))
      keys.zipWithIndex.map { case (k, i) =>
        ChangeEvent("update", "t", k, ts(seqBase + i), seqBase + i,
          s"""{"v":"u$seqBase"}""")
      }.toSeq.toDF()
    }

    def copyState(src: String, dst: String): Unit = {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(src).getFileSystem(conf)
      FileUtil.copy(fs, new Path(src), fs, new Path(dst), false, conf): Unit
    }

    def cell(tag: String, s: Long, buckets: Int, batchRows: Int): Unit = {
      val seed = s"$base/seed_${tag}_${s}_$buckets"
      seedState(seed, s, buckets)
      val times = (0 until 3).map { r =>
        val dir = s"$base/run_${tag}_${s}_${buckets}_$r"
        copyState(seed, dir)
        val batch = batchOf(batchRows, s, 1000000L + r * batchRows)
        batch.count() // materialize input outside the timer
        val t0 = System.nanoTime()
        CdcPipeline.applyBatch(spark, batch, dir)
        (System.nanoTime() - t0) / 1e9
      }
      val sec = times.min
      val touched = batchOf(batchRows, s, 999L)
        .select(pmod(xxhash64(col("table"), col("key")), lit(buckets))
          .cast("int"))
        .distinct().count()
      println(f"""{"leg":"$tag","state_rows":$s,"buckets":$buckets,"batch_rows":$batchRows,"touched":$touched,"sec":$sec%.2f,"events_per_sec":${(batchRows / sec).toLong}}""")
    }

    // leg 1: bucket-count knob at fixed state and batch
    Seq(16, 64, 256).foreach(b => cell("buckets", 800000L, b, 500))
    // leg 2: state growth at fixed bucket count and batch
    Seq(200000L, 800000L, 3200000L).foreach(s => cell("state", s, 64, 500))
    spark.stop()
  }
}
