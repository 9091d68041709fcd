package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: measures IVF-PQ output identity vs brute force across
  * (nprobe, rerank) configs at both fixture scales — the measurement
  * that decides whether x_knn_ivfpq can carry the brute-force oracle
  * (the x_knn_lsh multiProbe=4 precedent) and which honest config the
  * recall spec should pin.
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.model.Tables.embeddings(spark, sf)
      val q = emb.filter(col("vec_id") < 5)
      val cand = emb.filter(col("vec_id") >= 5)
      val brute = graft.sim.VectorOps.knnBruteForce(q, cand, 10).collect().toSeq
      for (nprobe <- Seq(4, 8, 16); rerank <- Seq(50, 100, 200, 400)) {
        val pq = graft.sim.IvfOps.knnIvfPq(q, cand, 10,
          c = 16, nprobe = nprobe, m = 8, ksub = 16, rerank = rerank)
          .collect().toSeq
        val ident = pq == brute
        val overlap = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
          .intersect(brute.map(r => (r.getLong(0), r.getLong(1))).toSet).size
        println(s"[pq] $sf nprobe=$nprobe rerank=$rerank " +
          s"identical=$ident recall=${overlap / 50.0}")
      }
    }
    spark.stop()
  }
}
