package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering for multi-column pruning.
  *
  * The hash database clusters files on ONE key (the digest), which makes
  * single-key range pruning near-perfect (SCALING.md). Analytics tables
  * are filtered on TWO-plus columns at once (user × time, lang × quality);
  * a linear sort on either column leaves the other scattered across every
  * file, so min/max row-group pruning only helps the leading key. Z-order
  * interleaves the bit-ranks of both keys into one sort value — points
  * close in the 2-D box are close on the curve — so each file covers a
  * small rectangle of the (a, b) space and a 2-D box predicate intersects
  * few files. This is the same layout trade the hash-sorted build makes,
  * generalized to multi-column scans; the cost is one range shuffle at
  * write time, identical to any global sort.
  *
  * Keys are bucketed by QUANTILE rank, not linear min/max scaling: real
  * columns are skewed (heavy-tailed values, sparse ids), and equal-width
  * buckets would park most of the mass in a handful of codes, leaving the
  * interleaved bits uninformative exactly where the data is. Quantile
  * boundaries come from `approxQuantile` (driver-held, ≤ 2^bits doubles);
  * the bucket assignment is a codegen sum of comparisons — no UDF, no
  * extra shuffle beyond the final range partition.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two bucketed keys (values in
    * [0, 2^bits)): bit i of `a` lands at position 2i+1, of `b` at 2i.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i) % 2, 2 * i + 1) +
        shiftleft(shiftright(b.cast("long"), i) % 2, 2 * i)
    }.reduce(_ + _)

  /** Rank-bucket expression from precomputed quantile `boundaries`
    * (ascending, length ≤ 2^bits - 1): the bucket is the number of
    * boundaries ≤ the value — a branch-free comparison sum that codegen
    * compiles into a flat arithmetic chain.
    */
  def rankBucket(c: Column, boundaries: Seq[Double]): Column =
    if (boundaries.isEmpty) lit(0L)
    else boundaries.map(b => when(c.cast("double") >= lit(b), 1L).otherwise(0L))
      .reduce(_ + _)

  /** Quantile boundaries for `colName` at 2^bits buckets. */
  def quantileBoundaries(df: DataFrame, colName: String, bits: Int): Seq[Double] = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (1 << bits)).toArray
    df.select(col(colName).cast("double").as(colName))
      .stat.approxQuantile(colName, probs, 1.0 / (1 << (bits + 2)))
      .toSeq.distinct // collapsed duplicates: low-cardinality columns
  }

  /** Write `df` as `numFiles` parquet files clustered on the Z-curve of
    * (colA, colB). One `approxQuantile` pass per key (boundary arrays to
    * the driver), one range shuffle on the z-value — the same cost shape
    * as the build's hash sort, so it scales the same way. `bits` = 6
    * (64 ranks per dimension) discriminates up to ~4096 files; raise it
    * only alongside file count.
    */
  /** Rank bucket stretched over the full code range [0, 2^bits): a
    * low-cardinality key yields few distinct ranks, which would leave the
    * HIGH interleave bits constant (no discrimination where the curve
    * needs it most) — so the k+1 observed ranks are spread across all
    * 2^bits codes.
    */
  def scaledBucket(c: Column, boundaries: Seq[Double], bits: Int): Column =
    if (boundaries.isEmpty) lit(0L)
    else floor(rankBucket(c, boundaries) *
      lit(((1 << bits) - 1).toDouble / boundaries.size)).cast("long")

  def writeClustered(
      df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 8, bits: Int = 6
  ): Unit = {
    val z = zValue(
      scaledBucket(col(colA), quantileBoundaries(df, colA, bits), bits),
      scaledBucket(col(colB), quantileBoundaries(df, colB, bits), bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
