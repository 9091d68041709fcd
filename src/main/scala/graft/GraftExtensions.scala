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
  * `graft_minhash(shingles, k)`, `graft_lang_id(text)`,
  * `graft_nfc(text)`, and the portable
  * cross-engine family `graft_md5_48(text)` / `graft_simhash48(text)` /
  * `graft_minhash_portable(shingles, k)` — all codegen'd StaticInvoke
  * kernels.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name), builder))
    }
}

object GraftFunctions {

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${es.length}")
      f(es)
    }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fingerprint" -> arity("graft_fingerprint", 1)(es =>
      Kernels.fingerprintExpr(es.head)),
    "graft_simhash" -> arity("graft_simhash", 1)(es =>
      Kernels.simhashExpr(es.head)),
    "graft_cosine" -> arity("graft_cosine", 2)(es =>
      Kernels.cosineExpr(es(0), es(1))),
    "graft_shingles" -> arity("graft_shingles", 2)(es =>
      Kernels.shinglesExpr(es(0), es(1))),
    "graft_minhash" -> arity("graft_minhash", 2)(es =>
      Kernels.minhashExpr(es(0), es(1))),
    "graft_lang_id" -> arity("graft_lang_id", 1)(es =>
      Kernels.langIdExpr(es.head)),
    // portable (cross-engine md5-derived) hash family — see
    // graft.sim.PortableHash
    "graft_md5_48" -> arity("graft_md5_48", 1)(es =>
      Kernels.md5_48Expr(es.head)),
    "graft_simhash48" -> arity("graft_simhash48", 1)(es =>
      Kernels.simhash48Expr(es.head)),
    "graft_minhash_portable" -> arity("graft_minhash_portable", 2)(es =>
      Kernels.minhashPortableExpr(es(0), es(1))),
    "graft_nfc" -> arity("graft_nfc", 1)(es =>
      Kernels.nfcExpr(es.head)))

  /** Register all kernels as temp functions on a running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
