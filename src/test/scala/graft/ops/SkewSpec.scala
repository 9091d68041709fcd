package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Salting must never change results — only the shuffle layout. */
class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"), salt = 7)
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedCount and saltedSum equal their unsalted twins") {
    val li = Tables.lineitem(spark, sf)
    val plainCnt = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedCnt = Skew.saltedCount(li, Seq("l_returnflag"), salt = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedCnt == plainCnt)

    val plainSum = li.groupBy("l_returnflag")
      .agg(CoreOps.exactSum(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = Skew.saltedSum(li, Seq("l_returnflag"),
      col("l_quantity"), salt = 5, as = "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum == plainSum) // decimal sums: bit-exact under salting
  }

  test("autoSalt picks the factor the advisory demands, 1 when balanced") {
    import spark.implicits._
    // hot fixture: one key holds 900 of 1000 rows; at P=10 the average
    // reducer load is 100, so the hot key must split ceil(900*10/1000)=9 ways
    val hot = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k")
    assert(Skew.autoSalt(hot, Seq("k"), parallelism = 10) == 9)
    // balanced fixture: every key equally loaded → factor 1 (don't salt)
    val flat = (1 to 1000).map(i => s"k${i % 20}").toDF("k")
    assert(Skew.autoSalt(flat, Seq("k"), parallelism = 10) == 1)
    // the factor is clamped to the parallelism even for a 1-key table
    val one = (1 to 500).map(_ => "only").toDF("k")
    assert(Skew.autoSalt(one, Seq("k"), parallelism = 8) == 8)
    // pure decision arithmetic, pinned
    assert(Skew.autoSaltFactor(1000L, 900L, 10) == 9)
    assert(Skew.autoSaltFactor(1000L, 100L, 10) == 1)
    assert(Skew.autoSaltFactor(0L, 0L, 10) == 1)
    // ...and the advisory-chosen salted plan returns the unsalted truth
    val plain = hot.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val auto = Skew.saltedCount(hot, Seq("k"),
        Skew.autoSalt(hot, Seq("k"), 10))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(auto == plain)
  }
}
