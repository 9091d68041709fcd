package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sim.Perceptron

/** Dev probe: does the AVERAGED full-batch perceptron beat the plain
  * one's majority-class plateau on the overlapping harness labels?
  * Prints accuracy per rounds setting for both variants — the
  * measurement behind registering (or declining) x_perceptron_avg.
  */
object PerceptronProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb =
      if (args.contains("--pair"))
        Tables.embeddings(spark, sfDir).filter(col("label").isin(0, 1))
      else Tables.embeddings(spark, sfDir)
    val yPlus =
      if (args.contains("--pair")) col("label") === 0 else col("label") <= 4
    val q = Perceptron.quantize(emb, yPlus)
    val n = q.count()
    for (rounds <- Seq(1, 2, 3, 5, 8)) {
      val wPlain = Perceptron.train(q, 65, rounds)
      val wAvg = Perceptron.trainAveraged(q, 65, rounds)
      def acc(w: Array[Long]): Long =
        Perceptron.classify(q, w).filter(col("y") === col("y_pred")).count()
      println(s"[probe] rounds=$rounds plain=${acc(wPlain)}/$n " +
        s"avg=${acc(wAvg)}/$n")
    }
    spark.stop()
  }
}
