package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the bucketed keyed monitors (round 13's headline
  * change): measure a TINY micro-batch applied against a LARGE netted
  * state, against the bulk load that built the state. The r12 form
  * rewrote the full netted count tables each round, so tiny-batch cost
  * tracked STATE size; the bucketed form's tiny-batch cost must track
  * BATCH spread (touched buckets), not keys. Prints one JSON line —
  * the measurement lands in docs/SCALE.md, not the bench (fixture
  * machinery, not an operator row).
  */
object MonitorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-monitor-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.CdcQualityKeyed
    val spec = graft.Queries.qualityKeyedSpec
    val raw = graft.Queries.qualityKeyedRawStream(spark, sfDir)
      .persist()
    val nEvents = raw.count()
    val dir = graft.ops.CoreOps.scratchDirUnique("monitor_probe") + "/state"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // bulk load: the whole change log as one batch (state creation)
    val bulk = timed(CdcQualityKeyed.applyBatch(raw, dir, spec,
      numBuckets = 64))
    val keys = spark.read.parquet(s"$dir/u")
      .filter(col("part") === "s").count()
    // tiny batch: 1000 fresh fact inserts over 16 keys — a real
    // micro-batch's key spread touches FEW of the 64 buckets, which is
    // the entire point being measured
    def tinyBatch(keyBase: Long, seqBase: Long) =
      spark.range(0, 1000).select(
        lit("lineitem_cdc").as("table"), lit("insert").as("op"),
        concat(lit("""{"l_orderkey":"""), (col("id") % 16 + keyBase),
          lit(""","l_linenumber":1,"l_quantity":5.0,"l_returnflag":"N","""),
          lit(""""l_shipdate":"1995-01-01","l_extendedprice":1.0,"""),
          lit(""""l_discount":0.1}""")).as("payload"),
        lit(null).cast("string").as("payload_before"),
        (col("id") % 4).cast("string").as("src"),
        (col("id") + seqBase).as("seq"))
    val tiny = tinyBatch(100000000L, 4000000000L)
    // warm once on a disjoint key slice so JIT/codegen is comparable,
    // then measure (min of 2: fresh apply + gated replay share the
    // bucket spread and the work shape)
    CdcQualityKeyed.applyBatch(tinyBatch(200000000L, 5000000000L), dir, spec)
    // the load-independent claim is BYTES: a micro-batch rewrites the
    // bytes of its touched buckets, never the state's — snapshot the
    // file listing around the measured apply
    def listing(): Map[String, Long] = {
      val base = java.nio.file.Paths.get(dir)
      val st = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(pp => base.relativize(pp).toString ->
            java.nio.file.Files.size(pp)).toMap
      } finally st.close()
    }
    val before = listing()
    val t1 = timed(CdcQualityKeyed.applyBatch(tiny, dir, spec))
    val after = listing()
    val stateBytes = before.values.sum
    val rewritten = after.filter { case (k, v) => before.get(k) != Some(v) }
      .values.sum
    // bucket identity = side + tag ("u/bucket=3"): both sides reuse tags
    def bucketDir(k: String): Option[String] = {
      val parts = k.split("/")
      val i = parts.indexWhere(_.startsWith("bucket="))
      if (i < 0) None else Some(parts.take(i + 1).mkString("/"))
    }
    def bucketsOf(m: Map[String, Long]): Int =
      m.keySet.flatMap(bucketDir).size
    val touched = after.keySet.filter(k => before.get(k) != after.get(k))
      .flatMap(bucketDir)
    // replay: the seq gates drop everything; same bucket spread
    val t2 = timed(CdcQualityKeyed.applyBatch(tiny, dir, spec))
    raw.unpersist()
    println(s"""{"probe":"monitor_bucketed","sf":"$sfDir","events":$nEvents,""" +
      s""""state_keys":$keys,"bulk_load_sec":${f(bulk)},""" +
      s""""tiny_batch_sec":${f(math.min(t1, t2))},""" +
      s""""tiny_replay_sec":${f(t2)},""" +
      s""""state_bytes":$stateBytes,"rewritten_bytes":$rewritten,""" +
      s""""touched_bucket_dirs":${touched.size},""" +
      s""""total_bucket_dirs":${bucketsOf(before)}}""")
    spark.stop()
  }
  private def f(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)
}
