package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Sketch-based aggregates — the 100 TB path where exact distinct/quantile
  * state won't fit. Sketches can't hash-match an oracle, so these are
  * tolerance specs against the exact answers on the same data.
  */
class ApproxAggSpec extends AnyFunSuite with SparkTestBase {

  private lazy val lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")

  test("approx_count_distinct within 5% of exact countDistinct") {
    val row = lineitem.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"HLL error $err (exact=$exact approx=$approx)")
  }

  test("percentile_approx brackets the exact percentile") {
    val row = lineitem.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median off: exact=$exact approx=$approx")
  }

  test("sketches aggregate mergeably across groups (partial-combine shape)") {
    // per-group sketches must roughly sum to the global cardinality when
    // keys don't overlap groups (l_orderkey ranges per returnflag overlap,
    // so just sanity-check each group's estimate is sane)
    val groups = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    groups.foreach { r =>
      val err = math.abs(r.getLong(2) - r.getLong(1)).toDouble / r.getLong(1)
      assert(err < 0.05, s"group ${r.getString(0)}: $err")
    }
  }
}
