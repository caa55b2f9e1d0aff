package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join — the second join shape Spark lacks a native
  * operator for. A raw `a.t BETWEEN b.lo AND b.hi` condition becomes a
  * nested-loop join; the scalable formulation buckets time into
  * fixed-width chunks: intervals replicate into every bucket they
  * overlap, points land in one bucket, and the join is an EQUI-join on
  * (key, bucket) + a residual range filter. Replication factor =
  * interval_width / bucketWidth + 1, chosen by the caller to match the
  * expected interval length.
  */
object RangeJoin {

  /** Join `points` (with long column `timeCol`) to `intervals` (with long
    * columns `loCol`..`hiCol`), matching on `keyCol` equality and
    * `lo <= t <= hi`. Returns point columns + interval columns.
    */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      keyCol: String, timeCol: String, loCol: String, hiCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(timeCol) / bucketWidth))
    val i = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    p.join(i, Seq(keyCol, "_bucket"))
      .filter(col(timeCol) >= col(loCol) && col(timeCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Interval×interval OVERLAP join — the third join shape (after as-of
    * and point-in-range) Spark has no native operator for. Both sides
    * replicate into every bucket they touch and equi-join on
    * (key, bucket) with the residual overlap predicate
    * `a.lo ≤ b.hi ∧ b.lo ≤ a.hi`; a pair overlapping across several
    * buckets would emit once per shared bucket, so the join keeps only
    * the FIRST common bucket — `bucket = ⌊max(a.lo, b.lo)/width⌋`, which
    * both intervals provably contain — the textbook dedup that avoids a
    * distinct over the output. Work = replicated rows, an equi-shuffle,
    * and codegen filters; replication = interval_width/bucketWidth + 1
    * per side, the caller's knob. Column names must be disjoint across
    * the two inputs (same contract as [[intervalJoin]]).
    */
  def overlapJoin(
      a: DataFrame, b: DataFrame, keyCol: String,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ax = a.withColumn("_bucket",
      explode(sequence(floor(col(aLo) / bucketWidth),
        floor(col(aHi) / bucketWidth))))
    val bx = b.withColumn("_bucket",
      explode(sequence(floor(col(bLo) / bucketWidth),
        floor(col(bHi) / bucketWidth))))
    ax.join(bx, Seq(keyCol, "_bucket"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("_bucket") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth))
      .drop("_bucket")
  }
}
