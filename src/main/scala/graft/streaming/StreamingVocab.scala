package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Continuous vocabulary-saturation monitoring — the streaming face of
  * [[graft.ops.CorpusStats.vocabGrowth]]: as document micro-batches
  * arrive, each batch's token set folds into a running HLL sketch and
  * one ledger row records the cumulative curve point (tokens seen,
  * estimated distinct vocabulary, estimated type-token ratio). The
  * ingest dashboard's "is this crawl still contributing new language"
  * readout, live.
  *
  * Exact streaming distinct-token state is corpus-sized (every token
  * ever seen); the HLL sketch is the principled trade ([[graft.ops
  * .Sketches]]): ~±2% at lgK=12 for ~4 KB of state FOREVER. The
  * exactness contract is deliberately precise: the ledger row is a
  * deterministic function of the STORED sketch rows (redelivery
  * re-reads the same bytes → the same estimate, pinned exactly by
  * StreamingVocabSpec), while two independent BUILDS of "the same"
  * sketch are only tolerance-equal — partial-aggregation merge order
  * changes the sketch's sparse→dense path and can move the estimate
  * by ±1 (measured in the spec; the documented HLL accuracy bounds it).
  *
  * State shape is the [[CountLog]] discipline: per-batch rows
  * `(sketch, c, batch_id)` appended under the batch-id watermark,
  * periodically compacted to ONE row by the same staged swap (custom
  * fold: `hll_union_agg` + `sum(c)` instead of CountLog's sum-only, so
  * compaction reuses [[CountLog.recoverSwap]]'s exhaustive crash-point
  * repair). The ledger is recompute-if-missing: a crash between the
  * two appends self-heals on redelivery because the ledger row is a
  * deterministic function of the stored sketches.
  */
object StreamingVocab {

  final case class VocabResult(
      batchId: Long, tokensCum: Long, vocabEst: Long, ttrBpEst: Long)

  private val ledgerSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("tokens_cum", LongType, nullable = false),
    StructField("vocab_est", LongType, nullable = false),
    StructField("ttr_bp_est", LongType, nullable = false)))

  /** One micro-batch (or one batch-mode shard) through the monitor.
    * `batch` must carry a `text` column; tokens are the library's
    * whitespace tokens.
    */
  def vocabBatch(
      batch: DataFrame, sketchPath: String, ledgerPath: String,
      batchId: Long, lgK: Int = 12
  ): VocabResult = {
    val spark = batch.sparkSession
    val fs = new Path(sketchPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    CountLog.recoverSwap(fs, sketchPath)
    if (!CountLog.seen(spark, fs, sketchPath, batchId)) {
      val toks = batch
        .select(explode(graft.ops.TextAnalysis.tokens(col("text")))
          .as("_w"))
      toks.agg(hll_sketch_agg(col("_w"), lit(lgK)).as("sketch"),
          count(lit(1)).as("c"))
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Append).parquet(sketchPath)
    }
    val haveLedger = fs.exists(new Path(ledgerPath))
    val prior =
      if (haveLedger)
        spark.read.parquet(ledgerPath)
          .filter(col("batch_id") === batchId).collect().headOption
      else None
    val row = prior.getOrElse {
      val run = spark.read.parquet(sketchPath)
        // an EMPTY batch writes a NULL sketch row (hll_sketch_agg of no
        // rows); union over nulls-only is undefined — guard it
        .agg(hll_union_agg(col("sketch")).as("_s"),
          sum(col("c")).as("_c"))
        .select(
          when(col("_s").isNull, lit(0L))
            .otherwise(floor(hll_sketch_estimate(col("_s"))).cast("long"))
            .as("vocab_est"),
          coalesce(col("_c"), lit(0L)).as("tokens_cum"))
        .collect()(0)
      val tokensCum = run.getAs[Long]("tokens_cum")
      val vocabEst = run.getAs[Long]("vocab_est")
      val ttr =
        if (tokensCum > 0L) vocabEst * 10000L / tokensCum else 0L
      val d = spark.createDataFrame(
        java.util.List.of(Row(batchId, tokensCum, vocabEst, ttr)),
        ledgerSchema)
      d.write.mode(SaveMode.Append).parquet(ledgerPath)
      d.collect()(0)
    }
    VocabResult(row.getAs[Long]("batch_id"), row.getAs[Long]("tokens_cum"),
      row.getAs[Long]("vocab_est"), row.getAs[Long]("ttr_bp_est"))
  }

  /** Compact the sketch log to one row (register-max union + count sum),
    * via the shared staged swap — every crash point heals through
    * [[CountLog.recoverSwap]] on the next entry.
    */
  def compactSketches(spark: SparkSession, sketchPath: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(sketchPath).getFileSystem(conf)
    CountLog.recoverSwap(fs, sketchPath)
    if (!fs.exists(new Path(sketchPath))) return
    val compacted = spark.read.parquet(sketchPath)
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("c")).as("c"), max(col("batch_id")).as("batch_id"))
      .filter(col("sketch").isNotNull) // nulls-only log: keep watermark
      .localCheckpoint(true)
    val rows = compacted.collect()
    val out = if (rows.isEmpty) {
      // all appended batches were empty — preserve the watermark with a
      // zero-count null-sketch row rather than dropping the table
      spark.read.parquet(sketchPath)
        .agg(first(col("sketch")).as("sketch"), sum(col("c")).as("c"),
          max(col("batch_id")).as("batch_id"))
        .localCheckpoint(true)
    } else compacted
    val tmp = new Path(sketchPath + ".compact-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    out.write.parquet(tmp.toString)
    val old = new Path(sketchPath + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(new Path(sketchPath), old)
    fs.rename(tmp, new Path(sketchPath))
    fs.delete(old, true)
  }

  /** Continuous monitoring from a streaming frame with a `text` column. */
  def run(stream: DataFrame, sketchPath: String, ledgerPath: String,
      checkpoint: String, lgK: Int = 12): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        vocabBatch(batch, sketchPath, ledgerPath, batchId, lgK)
        ()
      }
      .start()
}
