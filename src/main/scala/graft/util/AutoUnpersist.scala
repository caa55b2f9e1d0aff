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

  /** Persist `df` (MEMORY_AND_DISK) and release it after the first query
    * that consumes it completes. Returns the persisted frame.
    */
  def persistScoped(df: DataFrame): DataFrame =
    register(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

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
