package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Sketches

/** The quantile monitor's contracts: stream/batch parity (the last
  * ledger row equals the batch histogram-quantile op over the
  * concatenated stream), exactly-once under both crash injections, and
  * compaction that preserves totals + the idempotence watermark.
  */
class StreamingQuantilesSpec extends AnyFunSuite with SparkTestBase {

  private val Lo = 0.0
  private val Hi = 100.0
  private val Bins = 20

  test("stream/batch parity and running-quantile movement") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-squant").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val input = MemoryStream[Double]
    val q = StreamingQuantiles.run(input.toDF().toDF("v"), col("v"),
      counts, ledger, s"$dir/ckpt", Lo, Hi, Bins)
    val b1 = (1 to 50).map(_.toDouble % 30)      // low values
    val b2 = (1 to 50).map(i => 60.0 + i % 35)   // high tail arrives
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(ledger).orderBy("batch_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 50L &&
      rows(1).getAs[Long]("n") == 100L)
    assert(rows(1).getAs[Double]("p95") > rows(0).getAs[Double]("p95"),
      "high tail must raise the running p95")

    // parity: last ledger row == batch op over the concatenated stream
    val all = (b1 ++ b2).toDF("v")
    val sketch = Sketches.histogramSketch(all, col("v"), Lo, Hi, Bins)
    val exp = Sketches.histogramQuantiles(sketch, Seq(0.5, 0.95, 0.99),
      Lo, Hi, Bins).collect().map(r => r.getDouble(0) -> r.getDouble(1))
      .toMap
    assert(rows(1).getAs[Double]("p50") == exp(0.5) &&
      rows(1).getAs[Double]("p95") == exp(0.95) &&
      rows(1).getAs[Double]("p99") == exp(0.99),
      "stream ledger must equal the batch operator")
  }

  test("crash between counts and ledger self-heals; redelivery of a " +
    "completed batch is a no-op; compaction keeps the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-squant-crash").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val b0 = (1 to 40).map(_.toDouble).toDF("v")

    // injection 1: counts landed, ledger missing
    Sketches.histogramSketch(b0, col("v"), Lo, Hi, Bins)
      .select(col("bin"), col("cnt").as("c"))
      .withColumn("batch_id", lit(0L))
      .write.mode(SaveMode.Append).parquet(counts)
    val healed = StreamingQuantiles.quantileBatch(b0, col("v"),
      counts, ledger, 0L, Lo, Hi, Bins)
    assert(healed.n == 40L)
    assert(spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0) == 40L,
      "counts doubled on redelivery")
    assert(spark.read.parquet(ledger).count() == 1L)

    // injection 2: full redelivery of the completed batch
    val again = StreamingQuantiles.quantileBatch(b0, col("v"),
      counts, ledger, 0L, Lo, Hi, Bins)
    assert(again == healed)
    assert(spark.read.parquet(ledger).count() == 1L)

    // compaction: totals identical, watermark survives, new batch lands
    StreamingQuantiles.quantileBatch(
      (1 to 10).map(_ + 50.0).toDF("v"), col("v"),
      counts, ledger, 1L, Lo, Hi, Bins)
    StreamingQuantiles.compactCounts(spark, counts)
    assert(spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0) == 50L)
    val replay = StreamingQuantiles.quantileBatch(b0, col("v"),
      counts, ledger, 1L, Lo, Hi, Bins) // compacted id: still a no-op
    assert(replay.batchId == 1L &&
      spark.read.parquet(counts)
        .agg(sum(col("c"))).collect()(0).getLong(0) == 50L)
    val b2 = StreamingQuantiles.quantileBatch(
      (1 to 5).map(_ + 90.0).toDF("v"), col("v"),
      counts, ledger, 2L, Lo, Hi, Bins)
    assert(b2.n == 55L)
    assert(spark.read.parquet(ledger).count() == 3L)
  }

  test("empty first micro-batch: n=0 NaN ledger row, monitor survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-squant-empty").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    // routine in Structured Streaming: the first batch carries no rows
    val r0 = StreamingQuantiles.quantileBatch(
      Seq.empty[Double].toDF("v"), col("v"),
      counts, ledger, 0L, Lo, Hi, Bins)
    assert(r0.n == 0L && r0.p50.isNaN && r0.p95.isNaN && r0.p99.isNaN)
    assert(spark.read.parquet(ledger).count() == 1L)
    // the stream keeps going: the next non-empty batch computes normally
    val r1 = StreamingQuantiles.quantileBatch(
      (1 to 40).map(_.toDouble).toDF("v"), col("v"),
      counts, ledger, 1L, Lo, Hi, Bins)
    assert(r1.n == 40L && !r1.p50.isNaN)
    // and redelivery of the empty batch stays a no-op
    val again = StreamingQuantiles.quantileBatch(
      Seq.empty[Double].toDF("v"), col("v"),
      counts, ledger, 0L, Lo, Hi, Bins)
    assert(again.n == 0L && spark.read.parquet(ledger).count() == 2L)
  }
}
