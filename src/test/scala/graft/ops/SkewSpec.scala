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
}
