package graft.tools

import org.apache.spark.sql.SparkSession

/** The one dev probe (replaces the round-2..7 throwaway `*Perf*`/
  * `Plans`/`SlowProbe` one-offs): time registered queries warm, or dump
  * their physical plans for the pushdown/pruning/broadcast review loop.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Probe \
  *     [--plan] [--rounds N] [--cpus N] [query ...]"
  *
  *   - default: each named query runs `--rounds` times (noop sink, so
  *     sink cost never pollutes the number); round 1 is the cold/codegen
  *     run, the LAST round is the warm figure quoted in docs/SCALE.md.
  *   - `--plan`: `explain("formatted")` instead of timing.
  *
  * The bench-noise protocol (docs/SCALE.md): ≥3 warm rounds on a quiet
  * host before believing any regression — single-shot artifacts on a
  * bursty host have shown 3-4× swings on identical plans.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    var plan = false
    var rounds = 2
    var cpus = 32
    val names = scala.collection.mutable.Buffer.empty[String]
    def intArg(i: Int, flag: String): Int = {
      if (i + 1 >= args.length) sys.error(s"$flag requires a value")
      args(i + 1).toIntOption.filter(_ > 0)
        .getOrElse(sys.error(s"$flag wants a positive int, got '${args(i + 1)}'"))
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plan"   => plan = true; i += 1
        case "--rounds" => rounds = intArg(i, "--rounds"); i += 2
        case "--cpus"   => cpus = intArg(i, "--cpus"); i += 2
        case f if f.startsWith("--") => sys.error(s"unknown flag $f")
        case q          => names += q; i += 1
      }
    }
    if (names.isEmpty)
      names ++= Seq("q1_agg", "q_join_broadcast", "q_topk", "p1_projection")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'"))
      if (plan) {
        println(s"\n===== $n =====")
        fn(spark, sfDir).explain("formatted")
      } else for (r <- 1 to rounds) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n%-24s r$r ${s}%.2fs")
      }
    }
    spark.stop()
  }
}
