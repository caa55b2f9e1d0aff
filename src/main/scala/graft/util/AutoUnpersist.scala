package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped lifetime for the intermediates this library persists.
  *
  * Several operators (MinHash/SimHash LSH, embedding LSH) persist an
  * intermediate frame that their returned — still lazy — plan references
  * more than once (self-join sides, verify joins). The caller never sees
  * those frames, so the caller can't unpersist them; leaving them cached
  * forever means a user composing two ops accumulates dead blocks until
  * executor storage churns.
  *
  * `register(df)` ties the cached frame's lifetime to its first consuming
  * action instead: a QueryExecutionListener watches every completed query
  * in the session, and when one's analyzed plan contains the registered
  * frame's plan (the cache was just populated and used by that very
  * query), the frame is unpersisted. Re-executing the same returned
  * DataFrame later recomputes the intermediate — the documented contract:
  * these are single-consumption pipelines, not shared caches.
  */
object AutoUnpersist {
  // identity-keyed: SparkSession/Dataset don't override equals
  private val installed =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private val registry =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  private val nextScope = new java.util.concurrent.atomic.AtomicLong()

  /** Persist `df` (MEMORY_AND_DISK) and release it after the first query
    * that consumes it completes. Returns the persisted frame. LAZY by
    * contract — op construction launches no jobs (pinned by
    * DedupSimilaritySpec), and a constructed-but-never-consumed pipeline
    * costs nothing. The flip side: at planning time the cache is cold,
    * so Catalyst sees the UNDERLYING estimate, and for the explode-
    * derived frames this library persists that estimate is badly low
    * (see [[graft.util.Partitioning.indexSide]] for the measured
    * broadcast-OOM hazard and the join-site mitigation).
    *
    * The frame is tagged with a uniquely-named no-op `observe` INSIDE the
    * persisted plan, which makes its cache entry canonically unique. Two
    * concurrent pipelines over the same input would otherwise share one
    * cache entry by canonical-plan match, and the sweep for whichever
    * query finishes first unpersists that entry while the other query is
    * mid-scan — which under concurrency produced intermittently EMPTY
    * scan results (observed on the minhash/ngram pair sharing the shingle
    * frame; ConcurrentStressSpec reproduces it in-JVM without the tag).
    * With the tag, an entry is only ever consumed by the query built on
    * the very frame that registered it, so its release strictly follows
    * its only consumer's completion.
    */
  def persistScoped(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    register(persistDeferred(df))
  }

  /** Persist `df` (MEMORY_AND_DISK, uniquely observe-tagged like
    * [[persistScoped]]) WITHOUT arming auto-release — for ops that
    * populate the cache with their own bounded stats action before the
    * returned plan consumes it (release-on-first-consumer would evict
    * right after that stats action). Call [[register]] on the result
    * once the returned plan is built, so the first consumption of the
    * RETURNED plan releases the cache as usual.
    */
  def persistDeferred(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    df.observe(s"graft_scope_${nextScope.incrementAndGet()}",
      count(lit(1)).as("rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Release the already-persisted `df` after the first query that
    * consumes it completes (success or failure).
    */
  def register(df: DataFrame): DataFrame = {
    install(df.sparkSession)
    registry.add(df)
    df
  }

  private def install(spark: SparkSession): Unit =
    if (installed.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        private def sweep(qe: QueryExecution): Unit = {
          val it = registry.iterator()
          while (it.hasNext) {
            val df = it.next()
            val plan = df.queryExecution.analyzed
            if (qe.analyzed.exists(_.sameResult(plan))) {
              df.unpersist(blocking = false)
              it.remove()
            }
          }
        }
        override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
          sweep(qe)
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
          sweep(qe)
      })
}
