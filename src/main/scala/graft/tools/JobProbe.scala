package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-JOB wall-time breakdown of a registered query (the
  * empirical half of guide §1 — `Probe` times whole rows; this answers
  * WHERE inside a multi-job streaming row the seconds go). One warm
  * prime run, then one measured run with a listener printing each job's
  * duration, description and stage/task counts, plus the gaps BETWEEN
  * jobs (driver-side work: FS renames, collects, planning).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProbe <query>...
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("st_cdc_profile_ts")
    val qs = graft.SparkEntry.queries
    @volatile var t0 = System.nanoTime()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = 0L
    @volatile var record = false
    val tasksOf = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) { tasksOf.merge(sc.stageInfo.stageId,
          sc.stageInfo.numTasks, _ + _); () }
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(js.stageInfos.lastOption.map(si =>
            si.name + " [" + js.stageInfos.map(_.numTasks).sum + " tasks/" +
              js.stageInfos.size + " stages]"))
          .getOrElse("")
        jobStart.put(js.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) {
        Option(jobStart.get(je.jobId)).foreach { case (s, desc) =>
          val now = System.nanoTime()
          val gap = if (lastEnd == 0L) (s - t0) / 1e9 else (s - lastEnd) / 1e9
          lastEnd = now
          println(f"[jobprobe] job ${je.jobId}%4d  ${(now - s) / 1e9}%7.3f s" +
            f"  (gap before: $gap%6.3f s)  $desc")
        }
      }
    })
    names.foreach { n =>
      val fn = qs.getOrElse(n, sys.error(s"unknown query $n"))
      // prime (codegen + FS warm), untimed
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(s"[jobprobe] ===== $n (measured warm run) =====")
      record = true; t0 = System.nanoTime(); lastEnd = 0L
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      record = false
      println(f"[jobprobe] ===== $n total $wall%.3f s =====")
    }
    spark.stop()
  }
}
