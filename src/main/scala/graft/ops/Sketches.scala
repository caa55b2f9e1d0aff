package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting for corpus bookkeeping at 100 TB.
  *
  * An exact `countDistinct` over a corpus-scale column is a full shuffle
  * of every distinct value; a cardinality REPORT (how many unique
  * documents/shingles/urls per source, per day, overall) doesn't need
  * exactness. Datasketches HLL (Spark's `hll_sketch_agg` family, codegen,
  * map-side partials) gives ~±2% at lgK=12 for a few KB per group — and,
  * critically, sketches MERGE: per-partition/per-day sketches union into
  * rollups without touching the raw data again, which is what makes
  * incremental corpus accounting possible (sketch today's shard, union
  * with the running sketch; never re-scan history).
  *
  * Not DuckDB-oracle-able (different HLL implementations), so the
  * contract is pinned by SketchesSpec: error bounds vs exact counts and
  * exact associativity of the merge path.
  */
object Sketches {

  /** Per-group HLL sketch of `of`'s distinct values (binary column
    * `sketch`). lgK = 12 → ~±2% relative standard error, ~4 KB/sketch.
    */
  def distinctSketch(
      df: DataFrame, of: Column, groupBy: Seq[Column], lgK: Int = 12
  ): DataFrame =
    df.groupBy(groupBy: _*)
      .agg(hll_sketch_agg(of, lit(lgK)).as("sketch"))

  /** Merge per-group sketches (e.g. daily shards) into one sketch per
    * coarser key — no raw data involved.
    */
  def mergeSketches(sketches: DataFrame, groupBy: Seq[Column]): DataFrame =
    sketches.groupBy(groupBy: _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Estimated distinct count from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One-shot approximate distinct per group (sketch + estimate). */
  def approxDistinct(
      df: DataFrame, of: Column, groupBy: Seq[Column], lgK: Int = 12
  ): DataFrame =
    distinctSketch(df, of, groupBy, lgK)
      .withColumn("approx_distinct", estimate(col("sketch")))
      .drop("sketch")
}
