package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so every later
  * equi-join or aggregation on the bucket key runs with NO exchange on
  * that side.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides; when the same key joins repeatedly (orders ⋈ lineitem, events
  * sessionized per user, near-dup pairs per doc), bucketing amortizes
  * that shuffle into the single write. Both sides bucketed on the join
  * key with the same bucket count → SortMergeJoin with zero Exchange
  * (verified by BucketingSpec's plan assertion); one side bucketed →
  * only the other side shuffles.
  *
  * Spark's bucketing rides the table catalog (`bucketBy` requires
  * `saveAsTable`), so these helpers address tables, not bare paths —
  * which is what a long-lived 100 TB dataset is anyway.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted-within-buckets table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)

  /** The bucketed table, join-ready: equi-joins on its bucket key skip
    * the exchange (and with sorted buckets, often the sort too).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
