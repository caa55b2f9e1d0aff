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
}
