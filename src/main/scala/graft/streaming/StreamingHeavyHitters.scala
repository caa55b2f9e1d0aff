package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Sketches

/** Continuous heavy-hitter tracking — the streaming face of the
  * Misra–Gries summary ([[Sketches.mgSummary]]/[[Sketches.mgMerge]]):
  * as micro-batches arrive, the k-bounded counter table absorbs each
  * batch's exact counts through one [[Sketches.mgMerge]], so the hot
  * keys of an unbounded stream (toxic domains, spamming users, runaway
  * crawl hosts) are always on hand in k rows with the n/(k+1)
  * undercount guarantee — state independent of both stream length and
  * key-domain size.
  *
  * State is a sequence of VERSIONED summary directories on storage
  * (`statePath/b<batchId>`), not the checkpoint — the
  * [[StreamingDedup]]/[[StreamingDrift]] pattern so batch backfills and
  * the live stream share state, with a twist: because each batch
  * REPLACES the whole (≤ k row) summary rather than appending, crash
  * safety needs no rename dance at all. Each version is written once
  * under its batch id; exactly-once then falls out of three rules,
  * all pinned by StreamingHeavyHittersSpec:
  *
  *   - a COMPLETE `b<id>` dir (parquet `_SUCCESS` marker present)
  *     means batch id already folded — redelivery skips it;
  *   - an INCOMPLETE `b<id>` dir (crash mid-write) is deleted and
  *     recomputed from `b<prev>` + the redelivered batch — the merge
  *     is deterministic, so the healed summary is bit-identical;
  *   - versions older than the immediate predecessor are pruned AFTER
  *     the new version lands, so some complete ancestor always exists.
  */
object StreamingHeavyHitters {

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def versions(spark: SparkSession, statePath: String): Seq[Long] = {
    val fs = fsOf(spark, statePath)
    if (!fs.exists(new Path(statePath))) Seq.empty
    else fs.listStatus(new Path(statePath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("b"))
      .map(_.drop(1).toLong).sorted
  }

  private def complete(spark: SparkSession, dir: Path): Boolean =
    fsOf(spark, dir.toString).exists(new Path(dir, "_SUCCESS"))

  /** Latest COMPLETE summary strictly before `beforeId`, if any.
    * Incomplete dirs (crash mid-write) are ignored here and healed by
    * the next [[hitterBatch]] that lands on them.
    */
  def currentSummary(spark: SparkSession, statePath: String,
      beforeId: Long = Long.MaxValue): Option[DataFrame] =
    versions(spark, statePath).filter(_ < beforeId)
      .map(id => new Path(statePath, s"b$id"))
      .filter(complete(spark, _))
      .lastOption
      .map(dir => spark.read.parquet(dir.toString))

  /** Fold one micro-batch (or one batch-mode shard) into the summary.
    * Returns the summary now in force for this batch id.
    */
  def hitterBatch(batch: DataFrame, key: org.apache.spark.sql.Column,
      statePath: String, batchId: Long, k: Int): DataFrame = {
    val spark = batch.sparkSession
    val fs = fsOf(spark, statePath)
    val mine = new Path(statePath, s"b$batchId")
    if (fs.exists(mine) && complete(spark, mine))
      return spark.read.parquet(mine.toString) // redelivery: already folded
    if (fs.exists(mine)) fs.delete(mine, true) // crash mid-write: heal
    val counts = batch.select(key.as("key"))
      .groupBy("key").agg(count(lit(1)).as("c"))
    val merged = (currentSummary(spark, statePath, beforeId = batchId) match {
      case Some(prev) => Sketches.mgMerge(prev, counts, k)
      case None => Sketches.mgSubtract(counts, k)
    }).localCheckpoint(true)
    merged.coalesce(1).write.parquet(mine.toString)
    // prune everything older than the immediate predecessor
    versions(spark, statePath).filter(_ < batchId).dropRight(1)
      .foreach(id => fs.delete(new Path(statePath, s"b$id"), true))
    merged
  }

  /** Continuous tracking from a streaming frame. */
  def run(stream: DataFrame, key: org.apache.spark.sql.Column,
      statePath: String, checkpoint: String, k: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        hitterBatch(batch, key, statePath, batchId, k)
        ()
      }
      .start()
}
