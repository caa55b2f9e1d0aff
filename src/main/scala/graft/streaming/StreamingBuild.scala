package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.BuildJob

/** Structured Streaming face of the engine.
  *
  * The reference has no streaming subsystem (SURVEY.md §2.10); its closest
  * analogs are the unbounded stdin iterator and the incremental
  * append-merge, which is a manual micro-batch upsert. Those map directly:
  *
  *   readStream lines → stateful dropDuplicates (exact dedup A1) →
  *   hash expansion (stateless F2) → foreachBatch append-merge (J1).
  *
  * So each micro-batch replays exactly the batch build pipeline with
  * `append = true` — one code path for both execution modes.
  */
object StreamingBuild {

  /** Continuous hash-database build from a stream of words. */
  def run(
      words: Dataset[String],
      output: String,
      checkpoint: String,
      cfg: BuildJob.Config = BuildJob.Config()
  ): StreamingQuery =
    words.toDF("w")
      .filter(length(col("w")) > 0)
      // stateful exact dedup across the whole stream (state store backed);
      // at 100 TB/∞ retention you'd add a watermark + dropDuplicatesWithinWatermark
      .dropDuplicates("w")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        BuildJob.run(spark, batch.select("w").as[String], output,
          cfg.copy(append = true))
        ()
      }
      .start()

  /** Event-time tumbling-window aggregation with watermarked late-data
    * handling — the streaming twin of q_events_hourly_window.
    */
  def windowedEventCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Stateful per-user session counts over a stream (the streaming twin of
    * q_events_sessions, using session_window instead of lag()).
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))
}
