package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.Tables
import graft.sim.VectorOps

/** Throwaway: compare blind vs query-directed LSH multi-probe on the
  * embedding near-dup query — recall vs the exact cross-join form,
  * candidate-probe fan-out, and wall time, at both sf0.01 and sf0.1.
  */
object LshDirectedTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val vecs = Tables.embeddings(spark, dir).cache()
      vecs.count()
      val exact = VectorOps.cosineDupPairs(vecs, 0.4)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((label, probes, directed) <- Seq(
          ("blind4", 4, false), ("dir3", 3, true),
          ("dir2", 2, true), ("dir1", 1, true))) {
        val t0 = System.nanoTime()
        val got = VectorOps.cosineDupPairsLsh(vecs, 0.4, probes = probes,
            directed = directed)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[tune] $sf $label%-7s recall=${got.intersect(exact).size}/${exact.size} extra=${(got -- exact).size} ${secs}%.2fs")
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
