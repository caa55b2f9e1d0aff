package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bucketing must actually remove the shuffle: the point is plan shape,
  * so the assertions are on the executed plan, not just the results.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("both sides bucketed on the join key -> zero exchanges in the join") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")
    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
      "lineitem_b", "l_orderkey", 8)
    try {
      // hint the LEFT side so the planner picks the sort-merge path a
      // fact-fact join takes at scale (broadcast would bypass bucketing)
      val joined = Bucketing.table(spark, "lineitem_b").hint("merge")
        .join(Bucketing.table(spark, "orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      // results still correct vs the plain (shuffling) join
      val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")
    Bucketing.writeBucketed(
      lineitem.select("l_orderkey", "l_quantity"), "li_agg_b", "l_orderkey", 8)
    try {
      val agg = Bucketing.table(spark, "li_agg_b")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      val expected = lineitem.groupBy("l_orderkey")
        .agg(sum("l_quantity")).count()
      assert(agg.count() == expected)
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_b")
  }
}
