package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketized interval join equals the naive range-condition join") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val points = (1 to 500).map(i => (i % 7, rnd.nextInt(10000).toLong, i))
      .toDF("k", "t", "pid")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(9000).toLong
      (i % 7, lo, lo + rnd.nextInt(800).toLong, i)
    }.toDF("k", "lo", "hi", "iid")

    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    for (width <- Seq(10L, 256L, 1000L, 20000L)) {
      val bucketed = RangeJoin
        .intervalJoin(points, intervals, "k", "t", "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(bucketed == naive, s"divergence at bucketWidth=$width")
    }
  }

  test("interval boundaries are inclusive on both ends") {
    import spark.implicits._
    val points = Seq((1, 10L, "lo-edge"), (1, 20L, "hi-edge"), (1, 21L, "out"))
      .toDF("k", "t", "name")
    val intervals = Seq((1, 10L, 20L)).toDF("k", "lo", "hi")
    val matched = RangeJoin.intervalJoin(points, intervals, "k", "t", "lo", "hi", 7L)
      .select("name").collect().map(_.getString(0)).toSet
    assert(matched == Set("lo-edge", "hi-edge"))
  }

  test("overlapJoin equals the naive theta join; multi-bucket pairs emit once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // long intervals spanning many buckets (width 10) + edge touches
    val a = Seq((1, 0L, 95L, "a0"), (1, 50L, 60L, "a1"), (1, 200L, 210L, "a2"),
      (2, 0L, 5L, "a3")).toDF("k", "a_lo", "a_hi", "a_id")
    val b = Seq((1, 90L, 150L, "b0"), (1, 55L, 56L, "b1"), (1, 211L, 220L, "b2"),
      (2, 5L, 9L, "b3")).toDF("k", "b_lo", "b_hi", "b_id")
    val got = RangeJoin.overlapJoin(a, b, "k", "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val naive = a.join(b, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // exactly the naive pair set — no duplicates from shared buckets
    // (a0×b0 share buckets 9; a0×b1 share 5-6; a3×b3 touch at t=5)
    assert(got.sorted == naive.sorted && got.size == got.toSet.size,
      s"got ${got.sorted} want ${naive.sorted}")
    assert(got.toSet == Set(("a0", "b0"), ("a0", "b1"), ("a1", "b1"),
      ("a3", "b3")))
  }
}
