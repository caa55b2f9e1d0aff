package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{TextAnalysis, TextClean}

/** The streaming face of the whole curation pipeline: the chain a
  * production corpus build runs on a document firehose before anything
  * reaches training storage —
  *
  *   normalize → PII redact → language gate → quality gate
  *     → near-duplicate ADMISSION against the stored corpus
  *
  * Every stage is one of the engine's batch operators; the stream just
  * drives [[gate]] + [[StreamingDedup.admitBatch]] per micro-batch, so
  * batch and streaming runs of the same corpus agree (same code path —
  * the [[StreamingBuild]]/[[StreamingDedup]] pattern). State is the
  * admission pair (corpus parquet + signature index parquet) on storage,
  * not the checkpoint, so a batch backfill and a live stream can share
  * one corpus.
  *
  * Scale: the gates are codegen'd narrow projections (no shuffle) that
  * run BEFORE the shingle/minhash machinery, so per-batch near-dup work
  * is proportional to the *surviving* docs; admission itself is the
  * incremental-minhash shape (history×history never recomputed) — the
  * 100 TB-a-day arithmetic is in SCALING.md §Streaming.
  */
object StreamingCurate {

  final case class CurateResult(
      ingested: Long, gated: Long, admitted: Long, rejectedNearDup: Long)

  /** The curation gate as a pure frame transform, shared verbatim by the
    * oracle-gated batch query (q_pipeline_stream_curate) and the stream.
    *
    * Normalization runs FIRST (canonical bytes), then PII redaction (the
    * uppercase placeholders survive normalize because it already ran),
    * then the language and quality gates — quality is scored on the text
    * that would actually be stored, not the raw bytes.
    *
    * In: `doc_id, lang, text` (+ anything else, dropped).
    * Out: `doc_id, text (curated), quality_bp`.
    */
  def gate(docs: DataFrame, lang: String = "en",
      minQualityBp: Long = 4000L): DataFrame = {
    val curated = TextClean.redactPii(TextClean.normalize(col("text")))
    docs.filter(col("lang") === lang)
      .select(col("doc_id"), curated.as("text"))
      .withColumn("quality_bp",
        floor(TextAnalysis.qualityScore(col("text")) * 10000).cast("long"))
      .filter(col("quality_bp") >= minQualityBp)
  }

  /** One micro-batch (or one batch-mode shard) through the full chain.
    * `gated == admitted + rejectedNearDup` by construction — the gate
    * drops `ingested - gated` docs before admission ever sees them.
    */
  def curateBatch(
      batch: DataFrame, // columns: doc_id long, lang string, text string
      corpusPath: String, indexPath: String,
      lang: String = "en", minQualityBp: Long = 4000L,
      k: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      shingleSize: Int = 3
  ): CurateResult = {
    val nIn = batch.count()
    val r = StreamingDedup.admitBatch(
      gate(batch, lang, minQualityBp).select("doc_id", "text"),
      corpusPath, indexPath, k, rowsPerBand, threshold, shingleSize)
    CurateResult(nIn, r.admitted + r.rejected, r.admitted, r.rejected)
  }

  /** Continuous curation from a document stream into a stored corpus. */
  def run(
      docs: DataFrame, // streaming; columns: doc_id long, lang string, text string
      corpusPath: String, indexPath: String, checkpoint: String,
      lang: String = "en", minQualityBp: Long = 4000L,
      k: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      shingleSize: Int = 3
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, corpusPath, indexPath, lang, minQualityBp,
          k, rowsPerBand, threshold, shingleSize)
        ()
      }
      .start()
}
