package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.TextAnalysis

/** The drift monitor's three contracts: stream/batch parity (the ledger's
  * last row equals the batch JSD over the concatenated corpus), drift
  * monotonicity as off-reference vocabulary arrives, and exactly-once
  * under both crash injections (counts-landed/ledger-missing, and full
  * redelivery of an already-completed batch).
  */
class StreamingDriftSpec extends AnyFunSuite with SparkTestBase {

  private def refDocs = {
    import spark.implicits._
    (0L until 20L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
  }

  test("stream/batch parity, drift direction, and the alarm threshold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sdrift").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val ref = TextAnalysis.tokenCountTable(refDocs).localCheckpoint(true)

    val input = MemoryStream[(Long, String)]
    val query = StreamingDrift.run(input.toDF().toDF("doc_id", "text"),
      ref, counts, ledger, s"$dir/ckpt", alarmMillibits = 100L)
    try {
      // batch 1: on-reference text — negligible drift, no alarm
      input.addData((100L, "alpha beta gamma delta epsilon"),
        (101L, "beta gamma delta epsilon alpha"))
      query.processAllAvailable()
      // batch 2: heavily off-reference vocabulary — drift must rise
      input.addData((200L, "zeta eta theta iota kappa zeta eta"),
        (201L, "theta iota kappa zeta eta theta iota"))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.read.parquet(ledger).orderBy("batch_id").collect()
    assert(rows.length == 2)
    val (j1, j2) = (rows(0).getAs[Long]("jsd_millibits"),
      rows(1).getAs[Long]("jsd_millibits"))
    assert(j1 < 10L && !rows(0).getAs[Boolean]("alarm"),
      s"on-reference batch must not drift: $j1")
    assert(j2 > j1 && rows(1).getAs[Boolean]("alarm"),
      s"off-reference batch must alarm: $j2")

    // parity: the final ledger row IS the batch operator over the
    // concatenated stream corpus vs the same reference
    val streamed = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "beta gamma delta epsilon alpha"),
      (200L, "zeta eta theta iota kappa zeta eta"),
      (201L, "theta iota kappa zeta eta theta iota"))
      .toDF("doc_id", "text")
    val batchJsd = TextAnalysis.jsDivergence(streamed, refDocs)
      .collect()(0).getAs[Long]("jsd_millibits")
    assert(j2 == batchJsd,
      s"stream ledger ($j2) must equal batch JSD ($batchJsd)")
  }

  test("crash between counts append and ledger append self-heals; full " +
    "redelivery of a completed batch is a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sdrift-crash").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val ref = TextAnalysis.tokenCountTable(refDocs).localCheckpoint(true)
    val b0 = Seq((1L, "alpha beta gamma alpha")).toDF("doc_id", "text")

    // injection 1: a previous run died AFTER landing batch 0's counts
    // but BEFORE its ledger row
    TextAnalysis.tokenCountTable(b0).withColumn("batch_id", lit(0L))
      .write.mode(SaveMode.Append).parquet(counts)

    // redelivery of batch 0: counts must not double, ledger backfills
    val healed = StreamingDrift.driftBatch(b0, ref, counts, ledger, 0L)
    val storedTotal = spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(storedTotal == 4L, s"counts doubled on redelivery: $storedTotal")
    val ledger0 = spark.read.parquet(ledger).collect()
    assert(ledger0.length == 1 && ledger0(0).getAs[Long]("batch_id") == 0L)

    // injection 2: redeliver the now-COMPLETED batch — fully idempotent,
    // and the returned result matches the stored row
    val again = StreamingDrift.driftBatch(b0, ref, counts, ledger, 0L)
    assert(spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0) == 4L)
    assert(spark.read.parquet(ledger).count() == 1L)
    assert(again == healed)

    // and the healed row is the deterministic value: batch JSD parity
    val batchJsd = TextAnalysis.jsDivergence(b0, refDocs)
      .collect()(0).getAs[Long]("jsd_millibits")
    assert(healed.jsdMillibits == batchJsd)
  }

  test("compactCounts: history collapses to one row per token, the " +
    "idempotence watermark survives, and future batches are unaffected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sdrift-compact").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val ref = TextAnalysis.tokenCountTable(refDocs).localCheckpoint(true)
    def batch(id: Long, text: String) = StreamingDrift.driftBatch(
      Seq((id * 10, text)).toDF("doc_id", "text"), ref, counts, ledger, id)
    batch(0L, "alpha beta alpha")
    batch(1L, "alpha gamma")
    val before = spark.read.parquet(counts)
      .groupBy("tok").agg(sum(col("c")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    StreamingDrift.compactCounts(spark, counts)
    val after = spark.read.parquet(counts).collect()
    // one row per token, totals identical
    assert(after.length == before.size)
    assert(after.map(r => r.getAs[String]("tok") ->
      r.getAs[Long]("c")).toMap == before)
    // watermark: redelivering compacted batch 1 is a no-op
    val replay = batch(1L, "alpha gamma")
    assert(spark.read.parquet(counts)
      .filter(col("tok") === "alpha").agg(sum(col("c")))
      .collect()(0).getLong(0) == before("alpha"))
    assert(spark.read.parquet(ledger).count() == 2L)
    // a genuinely new batch still lands and extends the ledger
    batch(2L, "delta delta")
    assert(spark.read.parquet(ledger).count() == 3L)
    assert(spark.read.parquet(counts)
      .filter(col("tok") === "delta").count() == 1L)
    assert(replay.batchId == 1L)
  }

  test("a crash at any point of the compaction swap is healed before the " +
    "watermark reads: mid-rename, pre-rename, and post-rename injections") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-sdrift-swapcrash").toString
    val (counts, ledger) = (s"$dir/counts", s"$dir/ledger")
    val ref = TextAnalysis.tokenCountTable(refDocs).localCheckpoint(true)
    val fs = new Path(counts)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batch(id: Long, text: String) = StreamingDrift.driftBatch(
      Seq((id * 10, text)).toDF("doc_id", "text"), ref, counts, ledger, id)
    batch(0L, "alpha beta alpha")
    batch(1L, "alpha gamma")
    val total = spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0)

    // injection A (the advisor's case): crash BETWEEN the two renames —
    // counts is gone, the compacted data sits in .compact-tmp, the
    // pre-compaction table in .compact-old. Without recovery the next
    // driftBatch sees no counts table, treats batch 1 as unseen, and
    // silently restarts history. recoverSwap must complete the swap.
    val compacted = spark.read.parquet(counts)
      .groupBy("tok").agg(sum(col("c")).as("c"),
        max(col("batch_id")).as("batch_id")).localCheckpoint(true)
    compacted.write.parquet(counts + ".compact-tmp")
    fs.rename(new Path(counts), new Path(counts + ".compact-old"))
    assert(!fs.exists(new Path(counts))) // the dangerous window is real
    val replay = batch(1L, "alpha gamma") // redelivery during the window
    assert(fs.exists(new Path(counts)) &&
      !fs.exists(new Path(counts + ".compact-tmp")) &&
      !fs.exists(new Path(counts + ".compact-old")))
    assert(spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0) == total,
      "history lost or doubled across the healed swap")
    assert(spark.read.parquet(ledger).count() == 2L, "watermark forgotten")
    assert(replay.batchId == 1L)

    // injection B: crash BEFORE the first rename (stale tmp beside an
    // intact table) — recovery drops the redundant staged copy.
    spark.read.parquet(counts).localCheckpoint(true)
      .write.parquet(counts + ".compact-tmp")
    StreamingDrift.compactCounts(spark, counts)
    assert(!fs.exists(new Path(counts + ".compact-tmp")))
    assert(spark.read.parquet(counts)
      .agg(sum(col("c"))).collect()(0).getLong(0) == total)

    // injection C: crash AFTER the second rename, before cleanup —
    // recovery drops the orphaned old copy and the table reads as-is.
    spark.read.parquet(counts).localCheckpoint(true)
      .write.parquet(counts + ".compact-old")
    batch(2L, "delta")
    assert(!fs.exists(new Path(counts + ".compact-old")))
    assert(spark.read.parquet(ledger).count() == 3L)
  }
}
