package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class StreamingCusumSpec extends AnyFunSuite with SparkTestBase {

  private val (ref, slack, thr) = (5L, 1L, 10L)

  test("streamed micro-batches emit the exact batch statistic; late dups dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, Long)]
    val points = StreamingCusum.monitor(
      input.toDF().toDF("key", "step", "x").as[StreamingCusum.Obs],
      ref, slack, thr)
    val query = points.writeStream
      .format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      // batch 1: calm prefix for a, burst start for b (out of order in
      // the batch — the per-batch sort must fix it)
      input.addData(("a", 0L, 5L), ("a", 1L, 5L), ("b", 1L, 20L),
        ("b", 0L, 2L))
      query.processAllAvailable()
      // batch 2: a bursts; b replays step 1 (late duplicate — must be
      // dropped, not double-counted) and continues
      input.addData(("a", 2L, 30L), ("b", 1L, 20L), ("b", 2L, 25L))
      query.processAllAvailable()
      val got = spark.table("cusum_out")
        .collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("step")) ->
          (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm"))).toMap

      // the batch twin over the full concatenated history
      val history = Seq(("a", 0L, 5L), ("a", 1L, 5L), ("a", 2L, 30L),
        ("b", 0L, 2L), ("b", 1L, 20L), ("b", 2L, 25L))
        .toDF("key", "step", "x")
      val expected = graft.ops.TimeSeries.cusum(history, Seq("key"), "step",
          "x", lit(ref), lit(slack), lit(thr))
        .collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("step")) ->
          (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm"))).toMap
      assert(got == expected, s"got $got want $expected")
      assert(got.size == 6) // the replayed ("b", 1) emitted exactly once
      assert(got(("b", 2L))._2, "b's sustained burst must alarm")
    } finally query.stop()
  }
}
