package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The vocabulary-saturation monitor's contracts: stream/batch parity
  * (HLL register-max union is order-insensitive, so the last ledger row
  * equals the one-shot batch sketch over the concatenated stream —
  * EXACT equality, not a tolerance), saturation visible in the curve,
  * exactly-once under crash injections, and compaction that preserves
  * the estimate, the token total, and the idempotence watermark.
  */
class StreamingVocabSpec extends AnyFunSuite with SparkTestBase {

  private def docs(words: Seq[String]): Seq[String] =
    words.grouped(10).map(_.mkString(" ")).toSeq

  test("stream/batch parity (exact) and a saturating curve") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-svocab").toString
    val (sketches, ledger) = (s"$dir/sketches", s"$dir/ledger")
    val input = MemoryStream[String]
    val q = StreamingVocab.run(input.toDF().toDF("text"),
      sketches, ledger, s"$dir/ckpt")
    // batch 1: fresh vocab; batch 2: HALF repeats — growth slows
    val b1 = docs((1 to 300).map(i => s"w$i"))
    val b2 = docs((151 to 450).map(i => s"w$i"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(ledger).orderBy("batch_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("tokens_cum") == 300L &&
      rows(1).getAs[Long]("tokens_cum") == 600L)
    val (v1, v2) = (rows(0).getAs[Long]("vocab_est"),
      rows(1).getAs[Long]("vocab_est"))
    // 300 seen → ~300; 450 seen → ~450: grew, but by less than tokens
    assert(v2 > v1 && v2 - v1 < 300L, s"growth $v1 -> $v2")
    assert(rows(1).getAs[Long]("ttr_bp_est") <
      rows(0).getAs[Long]("ttr_bp_est"), "TTR must fall as vocab repeats")

    // replay parity (EXACT): the ledger is a deterministic function of
    // the STORED sketch log — unioning the stored rows reproduces the
    // ledger estimate bit-for-bit. This is the contract redelivery
    // recomputation rests on (freshly REBUILT sketches are only
    // tolerance-equal: partial-aggregation merge order changes the
    // sparse→dense path, so two builds of "the same" sketch can
    // estimate ±1 — measured here, documented in the scaladoc).
    val stored = spark.read.parquet(sketches)
      .agg(floor(hll_sketch_estimate(hll_union_agg(col("sketch"))))
        .cast("long"))
      .collect()(0).getLong(0)
    assert(v2 == stored, "stream ledger must replay from stored sketches")
    // one-shot parity (APPROXIMATE): the documented HLL accuracy
    val oneShot = (b1 ++ b2).toDF("text")
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .agg(floor(hll_sketch_estimate(
        hll_sketch_agg(col("w"), lit(12)))).cast("long"))
      .collect()(0).getLong(0)
    assert(math.abs(v2 - oneShot) * 100 <= oneShot * 2,
      s"union estimate $v2 vs one-shot $oneShot drifted past 2%")
  }

  test("crash between sketch and ledger self-heals; redelivery is a " +
    "no-op; compaction preserves estimate, total, and watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-svocab-crash").toString
    val (sketches, ledger) = (s"$dir/sketches", s"$dir/ledger")
    val b0 = docs((1 to 200).map(i => s"w$i")).toDF("text")

    // injection 1: sketch landed, ledger missing
    b0.select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .agg(hll_sketch_agg(col("w"), lit(12)).as("sketch"),
        count(lit(1)).as("c"))
      .withColumn("batch_id", lit(0L))
      .write.mode(SaveMode.Append).parquet(sketches)
    val healed = StreamingVocab.vocabBatch(b0, sketches, ledger, 0L)
    assert(healed.tokensCum == 200L,
      s"sketch doubled on redelivery: $healed")
    assert(spark.read.parquet(ledger).count() == 1L)

    // injection 2: full redelivery of the completed batch
    val again = StreamingVocab.vocabBatch(b0, sketches, ledger, 0L)
    assert(again == healed)
    assert(spark.read.parquet(sketches).count() == 1L &&
      spark.read.parquet(ledger).count() == 1L)

    // compaction: estimate + total identical, watermark survives
    val r1 = StreamingVocab.vocabBatch(
      docs((101 to 300).map(i => s"w$i")).toDF("text"),
      sketches, ledger, 1L)
    StreamingVocab.compactSketches(spark, sketches)
    assert(spark.read.parquet(sketches).count() == 1L)
    val replay = StreamingVocab.vocabBatch(b0, sketches, ledger, 1L)
    assert(replay == r1, "compacted watermark must reject redelivery")
    val r2 = StreamingVocab.vocabBatch(
      docs((301 to 320).map(i => s"w$i")).toDF("text"),
      sketches, ledger, 2L)
    assert(r2.tokensCum == 420L && r2.vocabEst > r1.vocabEst)
    // post-compaction estimate equals the union the ledger saw at r1
    assert(r1.tokensCum == 400L)
  }

  test("empty first micro-batch: zero ledger row, monitor survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-svocab-empty").toString
    val (sketches, ledger) = (s"$dir/sketches", s"$dir/ledger")
    val r0 = StreamingVocab.vocabBatch(
      Seq.empty[String].toDF("text"), sketches, ledger, 0L)
    assert(r0.tokensCum == 0L && r0.vocabEst == 0L && r0.ttrBpEst == 0L)
    // compaction over a nulls-only log keeps the watermark
    StreamingVocab.compactSketches(spark, sketches)
    val replay = StreamingVocab.vocabBatch(
      Seq.empty[String].toDF("text"), sketches, ledger, 0L)
    assert(replay == r0 && spark.read.parquet(ledger).count() == 1L)
    // the next non-empty batch computes normally
    val r1 = StreamingVocab.vocabBatch(
      docs((1 to 50).map(i => s"w$i")).toDF("text"),
      sketches, ledger, 1L)
    assert(r1.tokensCum == 50L && r1.vocabEst > 0L)
  }
}
