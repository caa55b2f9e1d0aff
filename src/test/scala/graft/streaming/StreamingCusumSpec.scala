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

  test("crash + restart from checkpoint: carried state survives, late " +
      "replays stay deduped, and the statistic still matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scusum-crash").toString
    val (ckpt, outDir) = (s"$dir/ckpt", s"$dir/points")
    val input = MemoryStream[(String, Long, Long)]
    // a durable sink (the memory sink refuses checkpoint recovery —
    // correctly, it loses its table on restart): emitted points append
    // to parquet per micro-batch, the production monitor shape
    def start() = StreamingCusum.monitor(
        input.toDF().toDF("key", "step", "x").as[StreamingCusum.Obs],
        ref, slack, thr)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StreamingCusum.Point], _: Long) =>
          ds.write.mode("append").parquet(outDir); ()
      }
      .start()

    // run 1: burst builds on key a (p and minP now both nonzero in the
    // state store), then the driver "dies" (stop() — the state store
    // has committed batch 1)
    val q1 = start()
    try {
      input.addData(("a", 0L, 2L), ("a", 1L, 20L))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: a NEW query restarts from the same checkpoint. The source
    // replays nothing (offsets committed), the state store restores
    // (p, minP, lastStep), and the next batch carries a LATE REPLAY of
    // step 1 — which must drop against the RESTORED lastStep, not
    // against a reset state (the failure mode a restart bug causes:
    // double-counted drift after recovery).
    val q2 = start()
    try {
      input.addData(("a", 1L, 20L), ("a", 2L, 25L), ("b", 0L, 30L))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("step")) ->
        (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm"))).toMap
    val history = Seq(("a", 0L, 2L), ("a", 1L, 20L), ("a", 2L, 25L),
      ("b", 0L, 30L)).toDF("key", "step", "x")
    val expected = graft.ops.TimeSeries.cusum(history, Seq("key"), "step",
        "x", lit(ref), lit(slack), lit(thr))
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("step")) ->
        (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm"))).toMap
    assert(got == expected,
      s"restart must replay to the exact batch statistic: got $got want $expected")
    assert(got.size == 4, "the late replay of (a, 1) must emit exactly once")
    assert(got(("a", 2L))._2, "the burst must still alarm across the restart")
  }
}
