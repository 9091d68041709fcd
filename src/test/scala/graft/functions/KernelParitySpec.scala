package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.CoreOps
import org.apache.spark.sql.functions._

/** Regression-pins for the kernel rewrites: the StaticInvoke kernels must
  * reproduce the expression forms they replaced, and the decimal-sum
  * pattern must be invariant under any partitioning (the claim the whole
  * oracle strategy rests on).
  */
class KernelParitySpec extends SparkSpec {

  test("shingle kernel equals the expression-form shingles on real docs") {
    val docs = Tables.documents(spark, sf).limit(100)
    val kernel = docs.select(col("doc_id"),
      Kernels.shinglesCol(col("text"), 3).as("sh"))
    // expression form: distinct 3-gram shingles via transform over tokens
    val t = TextFunctions.tokens(lower(col("text")))
    val expr = docs.select(col("doc_id"),
      when(size(t) >= 3,
        array_distinct(transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", slice(t, i + lit(1), lit(3))))))
        .otherwise(array().cast("array<string>")).as("sh"))
    val k = kernel.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val e = expr.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(k == e)
  }

  test("minhash kernel equals per-seed xxhash64 minima") {
    val docs = Tables.documents(spark, sf).limit(30)
    val viaKernel = graft.sim.DedupOps
      .minhashSignatures(docs, "text", "doc_id", 3, 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    val sh = graft.sim.DedupOps.shinglePairs(docs, "text", "doc_id", 3)
    val viaExpr = sh.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("shingle"))).as("h0"),
        min(xxhash64(lit(1), col("shingle"))).as("h1"),
        min(xxhash64(lit(2), col("shingle"))).as("h2"),
        min(xxhash64(lit(3), col("shingle"))).as("h3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaKernel == viaExpr)
  }

  test("exact decimal sums are bit-identical under any repartitioning") {
    val li = Tables.lineitem(spark, sf)
    def total(parts: Int): Double = li.repartition(parts)
      .agg(CoreOps.exactSum(col("l_extendedprice"))).head().getDouble(0)
    val results = Seq(1, 3, 7, 16).map(total).distinct
    assert(results.size == 1, s"partitioning changed the sum: $results")
    // contrast: a plain double sum is NOT guaranteed stable — the decimal
    // path is what the oracle strategy rests on (no assertion on the
    // plain form; it may or may not collide at this scale)
  }
}
