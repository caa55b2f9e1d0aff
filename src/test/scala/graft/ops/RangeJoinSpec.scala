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
}
