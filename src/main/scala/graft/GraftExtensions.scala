package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Kernels

/** SQL surface for the engine's native kernels.
  *
  * Two registration paths for the same builders:
  *   - `GraftExtensions` for config-time injection:
  *       `spark.sql.extensions=graft.GraftExtensions`
  *       (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  *   - `GraftFunctions.register(spark)` for an already-running session
  *       (temp functions, what the query registry uses).
  *
  * After either, plain SQL can call `graft_fingerprint(text)`,
  * `graft_simhash(text)`, `graft_cosine(a, b)`, `graft_shingles(text, n)`,
  * `graft_minhash(shingles, k)` — all codegen'd StaticInvoke kernels.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name), builder))
    }
}

object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fingerprint" -> ((es: Seq[Expression]) =>
      Kernels.fingerprintExpr(es.head)),
    "graft_simhash" -> ((es: Seq[Expression]) =>
      Kernels.simhashExpr(es.head)),
    "graft_cosine" -> ((es: Seq[Expression]) =>
      Kernels.cosineExpr(es(0), es(1))),
    "graft_shingles" -> ((es: Seq[Expression]) =>
      Kernels.shinglesExpr(es(0), es(1))),
    "graft_minhash" -> ((es: Seq[Expression]) =>
      Kernels.minhashExpr(es(0), es(1))))

  /** Register all kernels as temp functions on a running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
