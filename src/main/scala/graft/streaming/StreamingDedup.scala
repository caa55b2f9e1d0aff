package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Dedup

/** Streaming near-duplicate ADMISSION: the continuous-ingestion face of
  * [[graft.ops.Dedup.incrementalMinhash]], for the pipeline that cleans
  * a document firehose before it reaches a training corpus.
  *
  * Each micro-batch replays the batch incremental operator against the
  * STORED state — corpus parquet (admitted `doc_id, text`) plus the
  * signature index parquet (`doc_id, m0..m{k-1}`, what a production
  * pipeline persists alongside the corpus) — then appends the admitted
  * docs to the corpus and their signatures to the index, so later
  * batches (and later runs: the state is on storage, not in the
  * checkpoint) see them. One code path for batch and streaming, same as
  * [[StreamingBuild]]; history×history work is never redone, per the
  * incremental operator's contract.
  *
  * Admission policy is edge-greedy and deterministic: a doc is REJECTED
  * iff it has a ≥`threshold` verified near-duplicate that is already
  * stored, or one earlier in the same batch (smaller `doc_id`).
  * Transitively-chained borderline docs may drop where a sequential
  * one-at-a-time scan would keep them — the conservative side for
  * training-data dedup, and order-independent within a batch.
  */
object StreamingDedup {

  final case class BatchResult(admitted: Long, rejected: Long)

  /** One micro-batch (or one batch-mode shard) of admissions. Public so
    * batch pipelines and tests drive the exact code the stream runs.
    */
  def admitBatch(
      batch: DataFrame, // columns: doc_id long, text string
      corpusPath: String, indexPath: String,
      k: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      shingleSize: Int = 3
  ): BatchResult = {
    val spark = batch.sparkSession
    // exact-id dedup inside the batch (at-least-once sources re-deliver),
    // materialized once — every branch below reads it
    val fresh = batch.select("doc_id", "text").dropDuplicates("doc_id")
      .localCheckpoint(true)
    if (fresh.isEmpty) return BatchResult(0L, 0L)

    // history presence keys off the CORPUS (written first below): a crash
    // between the two appends must still count the orphaned docs as
    // admitted history, or redelivery would append them to the corpus a
    // second time
    val fs = new Path(corpusPath).getFileSystem(spark.sessionState.newHadoopConf())
    val bootstrapped = fs.exists(new Path(corpusPath))
    val emptyDocs = fresh.filter(lit(false))
    val emptySigs =
      Dedup.minhashSignaturesKernel(emptyDocs, k, shingleSize)
    val hist = if (bootstrapped) spark.read.parquet(corpusPath) else emptyDocs
    val storedSigs =
      if (bootstrapped && fs.exists(new Path(indexPath)))
        spark.read.parquet(indexPath)
      else emptySigs

    // self-heal the two-file state: corpus docs whose signatures never
    // reached the index (crash between the corpus append and the index
    // append) would otherwise be invisible to every future near-dup scan
    // — the corpus-membership anti-join drops their redeliveries and
    // nothing re-signs them. Backfill before the batch runs; the orphan
    // set is empty on every clean run, so this costs one id-only
    // anti-join probe per batch.
    val sigs = if (bootstrapped) {
      val orphans = hist
        .join(storedSigs.select("doc_id"), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      if (orphans.isEmpty) storedSigs
      else {
        val healed =
          Dedup.minhashSignaturesKernel(orphans, k, shingleSize)
            .localCheckpoint(true)
        healed.write.mode(SaveMode.Append).parquet(indexPath)
        storedSigs.union(healed)
      }
    } else storedSigs

    // ids already admitted in an earlier batch are redeliveries, not new
    // docs — the near-dup pass can't see them (same-id pairs fail i<j)
    val freshNew =
      if (bootstrapped)
        fresh.join(hist.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
      else fresh

    // verified ≥threshold pairs touching ≥1 new doc — new-new pairs
    // included, so in-batch near-dups resolve in the same pass
    val pairs = Dedup.incrementalMinhash(freshNew, hist, sigs,
        k, rowsPerBand, threshold, shingleSize)
      .select("i", "j").localCheckpoint(true)
    val admitted = freshNew
      .join(rejectedIds(pairs, freshNew.select("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    val nAdmitted = admitted.count()
    if (nAdmitted > 0) {
      // corpus first, index second: the corpus is the admission record
      // (membership anti-joins above key off it), and the batch-start
      // backfill re-signs any doc a crash strands between the two
      // appends — the two-file state is self-healing in both orders
      admitted.write.mode(SaveMode.Append).parquet(corpusPath)
      Dedup.minhashSignaturesKernel(admitted, k, shingleSize)
        .write.mode(SaveMode.Append).parquet(indexPath)
    }
    BatchResult(nAdmitted, fresh.count() - nAdmitted)
  }

  /** The edge-greedy rejection rule, as a pure frame transform (shared by
    * [[admitBatch]] and the oracle-gated q_dedup_admission query): given
    * verified pairs `(i, j)` with `i < j` and the set of NEW doc ids,
    * reject the new side of a new-old pair and the larger id of a
    * new-new pair.
    */
  def rejectedIds(pairs: DataFrame, newIds: DataFrame): DataFrame = {
    val flagged = newIds.withColumn("_new", lit(true))
    pairs
      .join(flagged.select(col("doc_id").as("i"), col("_new").as("_ni")), Seq("i"), "left")
      .join(flagged.select(col("doc_id").as("j"), col("_new").as("_nj")), Seq("j"), "left")
      .select(
        when(coalesce(col("_ni"), lit(false)) && coalesce(col("_nj"), lit(false)), col("j"))
          .when(coalesce(col("_ni"), lit(false)), col("i"))
          .otherwise(col("j")).as("doc_id"))
      .distinct()
  }

  /** Continuous admission from a document stream. */
  def run(
      docs: DataFrame, // streaming; columns: doc_id long, text string
      corpusPath: String, indexPath: String, checkpoint: String,
      k: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      shingleSize: Int = 3
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, corpusPath, indexPath, k, rowsPerBand, threshold,
          shingleSize)
        ()
      }
      .start()
}
