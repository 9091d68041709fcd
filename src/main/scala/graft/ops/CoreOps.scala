package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference-traceable row operators (SURVEY §2.1/§2.2/§2.6) as
  * `DataFrame => DataFrame` combinators. All are thin declarative wrappers
  * — the point is that Catalyst sees plain Filter/Project/Sort/Limit nodes
  * and pushes them into the parquet scan (PushedFilters / ReadSchema).
  */
object CoreOps {

  /** S1 (basic variant): closed-interval PK range scan
    * `pk >= lo AND pk <= hi` (mysql_to_clickhouse_sync.py:44).
    */
  def rangeScanClosed(df: DataFrame, pk: String, lo: Long, hi: Long): DataFrame =
    df.filter(col(pk) >= lo && col(pk) <= hi)

  /** S1 (pagination variant): half-open `pk >= lo AND pk < hi`
    * (mysql_to_clickhouse_sync_pagination.py:44) — the duplicate-free
    * form the engine uses everywhere.
    */
  def rangeScanHalfOpen(df: DataFrame, pk: String, lo: Long, hi: Long): DataFrame =
    df.filter(col(pk) >= lo && col(pk) < hi)

  /** S2/L1: deterministic pagination. The reference pages with
    * `LIMIT offset, limit` and NO ORDER BY
    * (mysql_to_clickhouse_sync_pagination.py:68) — nondeterministic under
    * concurrent writes (SURVEY §3.4-5). The engine requires a total-order
    * sort key; realized with Spark's native Offset operator (≥3.4).
    */
  def paginate(df: DataFrame, sortKeys: Seq[Column], offset: Int, limit: Int): DataFrame =
    df.orderBy(sortKeys: _*).offset(offset).limit(limit)

  /** A1: global bounds with the reference's `IFNULL(...,0)` sentinel
    * (mysql_to_clickhouse_sync.py:163-166) plus a real COUNT (A2 — the
    * reference only estimates `max-min+1`, sync.py:102).
    */
  def bounds(df: DataFrame, pk: String): DataFrame =
    df.agg(
      coalesce(min(col(pk)), lit(0L)).cast("long").as("min_id"),
      coalesce(max(col(pk)), lit(0L)).cast("long").as("max_id"),
      count(lit(1)).as("cnt"))

  /** Top-k: `ORDER BY keys LIMIT k` → Spark plans TakeOrderedAndProject
    * (no global sort; per-partition heaps + driver merge of k rows).
    */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** An exact decimal sum of a double column, returned as double.
    *
    * Doubles summed in parallel are order-dependent in the last ulp;
    * decimal sums are exact and associative, so the result is bit-stable
    * across any partitioning AND matches a single-threaded oracle
    * (DuckDB) exactly. This is the engine-wide pattern for money-ish
    * aggregates (also the reference's one real correctness battle —
    * decimal trailing zeros, mysql_to_clickhouse_sync.py:77-83).
    */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  /** Exact running/windowed variant of [[exactSum]]. */
  def exactSumExpr(c: Column): Column = c.cast("decimal(28,6)")

  /** Every scratch path embeds the owning pid as `_p<pid>`, and the
    * first scratch request of a JVM sweeps temp-root dirs whose owner
    * is no longer alive — so staged copies are reclaimed by the NEXT
    * run even after a crash, and a live concurrent JVM's dirs are
    * never touched. (A shutdown hook alone would miss kill -9.)
    */
  private val ScratchOwnerRe = ".*_p(\\d+)(?:_.*)?$".r
  private lazy val sweepDeadScratch: Unit = sweepDeadScratchNow()

  /** One sweep pass (normally run once per JVM via the lazy val above;
    * package-visible so the deletion policy is pinned by a spec).
    */
  /** Markerless dirs younger than this are left alone: a dir with no
    * `_p<pid>` marker is *presumed* pre-marker junk, but during an
    * upgrade window a still-running old-version JVM may be mid-read on
    * one — only age proves abandonment.
    */
  private[graft] val MarkerlessReclaimAgeMs: Long = 6L * 3600 * 1000

  private[graft] def sweepDeadScratchNow(): Unit = {
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val self = ProcessHandle.current().pid()
    try {
      val entries = java.nio.file.Files.list(root)
      try entries.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("graft_scratch_")) name match {
          // Try(toLong): a crafted >19-digit "pid" suffix must read as
          // not-a-marker (skipped below as too-young markerless), not
          // throw out of the sweep and poison every scratch allocation
          case ScratchOwnerRe(pid) if scala.util.Try(pid.toLong).isSuccess =>
            val id = pid.toLong
            val alive = id == self ||
              ProcessHandle.of(id).map[java.lang.Boolean](_.isAlive)
                .orElse(java.lang.Boolean.FALSE)
            if (!alive) deleteRecursively(p)
          case _ =>
            // no (parseable) owner marker: pre-marker code wrote it —
            // but an old-version JVM may still be running during an
            // upgrade window, so only reclaim once it has sat untouched
            // long past any job's lifetime
            val age = System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(p,
                java.nio.file.LinkOption.NOFOLLOW_LINKS).toMillis
            if (age > MarkerlessReclaimAgeMs) deleteRecursively(p)
        }
      } finally entries.close()
      // NonFatal, not just IOException: the sweep runs inside every
      // scratch allocation, and any single bad /tmp entry (unreadable
      // attrs, race on deletion, …) must degrade to "skip", never to
      // failing the caller's query
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Deletes NOFOLLOW: a symlink (plantable by any local user in a
    * world-writable tmpdir) is unlinked, never traversed — otherwise a
    * `graft_scratch_* -> /home/...` link would make the sweep delete
    * files outside the temp root.
    */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = java.nio.file.Files.list(p)
      try children.iterator().asScala.foreach(deleteRecursively)
      finally children.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  /** Deterministic per-(JVM, purpose, input-dir) scratch directory under
    * the JVM temp root. Queries that stage data (format round trips,
    * schema evolution) reuse and overwrite this dir on every run — a
    * fresh createTempDirectory per call would leak a table copy per
    * invocation until the disk fills. The pid in the path keeps the dir
    * private to one JVM: without it, bench and tests running
    * concurrently would overwrite the directory the other is mid-read
    * on. Dead JVMs' dirs are reclaimed by the dead-owner sweep above.
    */
  def scratchDir(purpose: String, inputDir: String): String = {
    sweepDeadScratch
    val key = java.lang.Integer.toHexString(inputDir.hashCode)
    val pid = ProcessHandle.current().pid()
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_scratch_${purpose}_${key}_p$pid")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Per-INVOCATION unique scratch directory — for operators that return
    * a LAZY reader over what they staged (PageRank ranks, BPE word
    * histograms). A shared deterministic dir ([[scratchDir]]) is unsafe
    * there: a second invocation would overwrite the files underneath the
    * first result's unevaluated plan, silently serving data from the
    * wrong input. Each dir is a bounded-size artifact (|V| ranks,
    * |vocab| counts — never a corpus-scale copy) that lives for the
    * owning JVM's lifetime and is reclaimed by the dead-owner sweep on
    * the next run.
    */
  def scratchDirUnique(purpose: String): String = {
    sweepDeadScratch
    val pid = ProcessHandle.current().pid()
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")),
      s"graft_scratch_${purpose}_p${pid}_")
    p.toString
  }

  /** Spread a narrow input across the cluster before CPU-heavy per-row
    * work (guide §2.5 "input skew": one small/unsplittable file gives
    * the scan ONE task, and every downstream map-side kernel —
    * tokenizing, segmenting, vector math — serializes on it; measured
    * locally as single-task 1-1.7 s jobs doing a whole row's work).
    * Scale-adaptive, not a local tune: when the scan already has at
    * least the session's default parallelism (any real corpus at any
    * real SF), this is the identity — no shuffle is added at 100 TB;
    * only a degenerate input (one tiny file, one gzip member, a
    * filtered-to-one-split read) pays one small round-robin exchange.
    * Values are untouched; callers' aggregations/sorts are
    * order-insensitive.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
