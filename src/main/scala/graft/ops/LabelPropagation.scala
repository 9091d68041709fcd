package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection ([EXT] graph
  * analytics beside [[PageRank]] and DedupOps.connectedComponents;
  * Raghavan et al. 2007, made deterministic): every node starts as its
  * own community, then each round adopts the most frequent label among
  * its neighbors, ties broken to the SMALLEST label — so a fixed
  * round count gives one well-defined answer on any partitioning or
  * engine (the same determinism stance as the integer PageRank), and
  * the DuckDB twin (`x_label_prop`) just unrolls the rounds.
  *
  * Scale shape per round: one |E|-sized hash join (edges ⨝ labels on
  * src — labels is |V| rows, broadcast-able until |V| is huge, then a
  * co-partitioned shuffle join), one (dst, label)-keyed count
  * aggregate (map-side combined), and one top-1 window partitioned
  * BY NODE (|V| rows) — never a global sort. All integer/id
  * arithmetic; no floats anywhere.
  */
object LabelPropagation {

  /** `(id, community)` after `iters` synchronized rounds over the
    * directed edge list `(src, dst)` (pass a symmetric edge set for
    * undirected semantics — the PageRank co-purchase graph already is).
    * A node with no in-edges keeps its current label.
    */
  def communities(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var labels = nodes.select(col("id"), col("id").as("label"))
    val byVotes = Window.partitionBy("id")
      .orderBy(col("n").desc, col("label").asc)
    for (_ <- 0 until iters) {
      val votes = e
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
      val winners = votes
        .withColumn("rn", row_number().over(byVotes))
        .filter(col("rn") === 1)
        .select(col("id"), col("label").as("new_label"))
      labels = labels.join(winners, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("new_label"), col("label")).as("label"))
    }
    labels.select(col("id"), col("label").as("community"))
  }
}
