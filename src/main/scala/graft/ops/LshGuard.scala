package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew guard for LSH banding self-joins.
  *
  * Every banded-LSH candidate generator in this engine self-joins a melted
  * (id, bucket-key) table on the bucket key. One degenerate signature — a
  * boilerplate-flooded corpus where k documents share a band signature —
  * creates k² candidate pairs in that bucket, which at corpus scale is a
  * quadratic blowup inside a single shuffle partition. The guard drops
  * buckets larger than a cap before the self-join and logs how many it
  * dropped: identical/boilerplate content is the *exact* dedup pass's job
  * (hash-groupBy — linear), so oversized near-dup buckets carry almost no
  * signal per pair anyway.
  */
object LshGuard {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `melted` minus all rows belonging to buckets (grouped by `keyCols`)
    * with more than `cap` members. Costs one vocabulary-sized aggregation
    * (map-side combined) plus an equi-join against the surviving bucket
    * list — both proportional to the number of distinct buckets, not to
    * candidate pairs.
    */
  def capBuckets(melted: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val sizes = melted.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bucket_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropped = sizes.filter(col("_bucket_n") > cap).count()
    if (dropped > 0)
      log.warn(s"LSH guard: dropping $dropped bucket(s) larger than $cap " +
        "members before the candidate self-join (degenerate signatures; " +
        "identical content belongs to the exact-dedup pass)")
    val keep = sizes.filter(col("_bucket_n") <= cap).drop("_bucket_n")
    melted.join(keep, keyCols)
  }
}
