package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

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
  *
  * The guard is fully lazy: the dropped-bucket count rides the query's own
  * execution as an observed metric (`observe()` + a QueryExecutionListener
  * that warns post-hoc). An earlier formulation `count()`ed the oversized
  * buckets at DataFrame-construction time, which materialized the whole
  * upstream signature pipeline in an extra Spark job per guarded query —
  * at corpus scale that is a second full pass over the data just to log.
  */
object LshGuard {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val nextId = new AtomicLong()
  private val MetricPrefix = "lsh_guard_"
  // sessions that already carry the logging listener (identity-keyed:
  // SparkSession doesn't override equals)
  private val installed =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** `melted` minus all rows belonging to buckets (grouped by `keyCols`)
    * with more than `cap` members. Costs one vocabulary-sized aggregation
    * (map-side combined) plus an equi-join against the surviving bucket
    * list — both proportional to the number of distinct buckets, not to
    * candidate pairs, and both part of the consuming query's plan (no
    * separate job).
    */
  def capBuckets(melted: DataFrame, keyCols: Seq[String], cap: Int,
      side: DataFrame => DataFrame = graft.util.Partitioning.indexSide
  ): DataFrame = {
    installListener(melted.sparkSession)
    val keep = melted.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bucket_n"))
      // metric name must be unique per query; predicates are not pushed
      // through CollectMetrics, so the metric sees every bucket size
      .observe(s"$MetricPrefix${nextId.incrementAndGet()}:$cap",
        sum(when(col("_bucket_n") > cap, 1L).otherwise(0L)).as("dropped"),
        max(col("_bucket_n")).as("largest"))
      .filter(col("_bucket_n") <= cap)
      .drop("_bucket_n")
    // keep ≈ one row per bucket key — corpus-scaled, so the join-back
    // stays partitioned unless the caller's corpus anchor proves it
    // small (see Partitioning.indexSide/indexSideFor for the
    // explode-descended-estimate broadcast hazard)
    melted.join(side(keep), keyCols)
  }

  private def installListener(spark: SparkSession): Unit =
    if (installed.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        private def report(qe: QueryExecution): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(MetricPrefix) && !row.isNullAt(0) &&
                row.getLong(0) > 0)
              log.warn(s"LSH guard: dropped ${row.getLong(0)} bucket(s) " +
                s"larger than ${name.substringAfter(':')} members " +
                s"(largest: ${row.get(1)}) before the candidate self-join " +
                "(degenerate signatures; identical content belongs to the " +
                "exact-dedup pass)")
          }
        override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
          report(qe)
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
          report(qe)
      })

  private implicit class StrOps(private val s: String) extends AnyVal {
    def substringAfter(c: Char): String = s.drop(s.indexOf(c) + 1)
  }
}
