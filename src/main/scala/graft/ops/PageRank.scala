package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank ([EXT]) — iterative graph analytics beyond
  * SQL's reach, in INTEGER-EXACT arithmetic so the result is
  * partitioning-independent and hash-matchable cross-engine: ranks live
  * on a 1e12 micro-grid, per-edge contributions use integral division
  * (`div`), and neighbor sums are exact long sums — the floating-point
  * formulation would drift with shuffle order, this one cannot.
  *
  * r0(v)   = SCALE div N
  * r'(v)   = (SCALE*150 div 1000) div N + (850 * Σ_{u→v} (r(u) div deg(u))) div 1000
  *
  * Per iteration: one equi-join of the edge list with the rank table
  * (shuffle on src), one aggregate on dst — the standard distributed
  * PageRank shape. The edge list is materialized once to scratch (the
  * unrolled lazy plan would otherwise recompute edge generation per
  * iteration); only the node COUNT reaches the driver.
  */
object PageRank {

  val Scale = 1000000000000L

  /** Ranks after `iters` iterations over directed `edges` (src, dst).
    * Every node must have at least one outgoing edge (true for the
    * symmetric graphs this engine builds) — dangling-mass handling is
    * deliberately out of scope.
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val dir = CoreOps.scratchDir("pagerank_edges", edges.columns.mkString)
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .write.mode("overwrite").parquet(dir)
    val e = spark.read.parquet(dir)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(Scale * 150L / 1000L / n) +
            expr("(850 * coalesce(s, 0L)) div 1000")).as("rank"))
    }
    ranks
  }
}
