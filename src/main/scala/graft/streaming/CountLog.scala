package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the "append-only mergeable count log" streaming
  * state shape ([[StreamingDrift]]'s counts table, [[StreamingQuantiles]]'
  * histogram log): per-batch additive count rows `(keys…, c, batch_id)`
  * appended under BATCH-ID WATERMARK idempotence, periodically compacted
  * to one row per key by a staged swap whose every crash point is
  * repaired on the next entry.
  *
  * The swap recovery is exhaustive over the double-rename's crash points
  * (tmp is only renamed into place after a completed write, so
  * completing is always safe):
  *
  *   - table PRESENT + tmp present → crash before the first rename:
  *     the table is intact, the staged copy redundant — drop tmp.
  *   - table ABSENT + tmp present → crash between the renames:
  *     complete the swap (tmp → table), drop the old copy.
  *   - table ABSENT + tmp absent + old present → roll back (old →
  *     table); unreachable in the current sequence but cheap to cover.
  *   - table PRESENT + old present → crash after the second rename,
  *     before cleanup: drop old.
  *
  * Without recovery, a half-swapped table reads as an EMPTY monitor and
  * the watermark silently restarts from batch 0 — the data-loss mode
  * StreamingDriftSpec pins.
  */
object CountLog {

  def recoverSwap(fs: FileSystem, tablePath: String): Unit = {
    val table = new Path(tablePath)
    val tmp = new Path(tablePath + ".compact-tmp")
    val old = new Path(tablePath + ".compact-old")
    if (fs.exists(table)) {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(tmp)) {
      fs.rename(tmp, table)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(old)) {
      fs.rename(old, table)
    }
  }

  /** Watermark idempotence check: batch ids are monotone under
    * foreachBatch, so `max(batch_id) >= batchId` means this batch's
    * counts already landed (and survives compaction, which stamps the
    * max compacted id). Call [[recoverSwap]] first.
    */
  def seen(spark: SparkSession, fs: FileSystem, tablePath: String,
      batchId: Long): Boolean =
    fs.exists(new Path(tablePath)) && {
      val wm = spark.read.parquet(tablePath)
        .agg(max(col("batch_id"))).collect()(0)
      !wm.isNullAt(0) && wm.getLong(0) >= batchId
    }

  /** Append `counts` (additive rows `keys… , c`) for `batchId` iff the
    * watermark hasn't passed it. Returns true if the append ran.
    */
  def append(counts: org.apache.spark.sql.DataFrame, tablePath: String,
      batchId: Long): Boolean = {
    val spark = counts.sparkSession
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    recoverSwap(fs, tablePath)
    if (seen(spark, fs, tablePath, batchId)) false
    else {
      counts.withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Append).parquet(tablePath)
      true
    }
  }

  /** Collapse the append history to ONE row per key (counts are
    * mergeable sums), stamped with the max compacted batch id so the
    * watermark keeps rejecting redelivered history. Staged swap; any
    * crash point heals via [[recoverSwap]] on the next entry.
    */
  def compact(spark: SparkSession, tablePath: String,
      keyCols: Seq[String]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tablePath).getFileSystem(conf)
    recoverSwap(fs, tablePath)
    if (!fs.exists(new Path(tablePath))) return
    val compacted = spark.read.parquet(tablePath)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("c")).as("c"), max(col("batch_id")).as("batch_id"))
      .localCheckpoint(true) // fully materialized before the swap
    val tmp = new Path(tablePath + ".compact-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    compacted.write.parquet(tmp.toString)
    val old = new Path(tablePath + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(new Path(tablePath), old)
    fs.rename(tmp, new Path(tablePath))
    fs.delete(old, true)
  }
}
