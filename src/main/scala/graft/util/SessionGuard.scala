package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Opt-in runtime guard for the measured shared-session hazard
  * (SCALING.md "Known hazards"): a co-tenant thread calling
  * `spark.catalog.clearCache()` mid-query can silently EMPTY another
  * thread's in-flight cached-plan query when AQE is enabled (measured
  * ~1/5–1/3 of runs under the GRAFT_STRESS campaigns; AQE off = 12/12
  * clean). The operational rule — never share a session with
  * clearCache callers; failing that, disable AQE — lived only in prose;
  * this turns it into (a) an enforceable session setting and (b) a
  * DETECTABLE condition via a cache canary.
  *
  *   - `install(spark)` — caches a one-row canary frame and, when AQE
  *     is on, logs the operational warning once. With
  *     `enforceAqeOff = true` it instead flips
  *     `spark.sql.adaptive.enabled` to false for the session (the only
  *     mitigation measurement supports — surgical rule exclusion was
  *     shown NOT sufficient).
  *   - `verify(spark)` — true iff the canary is still cached. A hostile
  *     or accidental `clearCache()` since install drops it (clearCache
  *     clears ALL cached plans, canary included), so a false return is
  *     direct evidence the hazard's trigger fired in this session; it
  *     logs + records via [[ConvergenceMetrics]] (op
  *     `sessionGuard.clearCache`). Costs a cache-manager lookup — no
  *     Spark job — so pipelines can call it at stage boundaries.
  *
  * The canary survives graft's own scoped persists ([[AutoUnpersist]]
  * unpersists only what it persisted), so only an out-of-band
  * clearCache — exactly the hazard — trips it.
  */
object SessionGuard {

  private val canaries = new ConcurrentHashMap[SparkSession, DataFrame]()
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Install the guard on `spark`. Idempotent per session. */
  def install(spark: SparkSession, enforceAqeOff: Boolean = false): Unit = {
    if (enforceAqeOff) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      log.info("graft SessionGuard: AQE disabled for this session " +
        "(shared-session clearCache hazard, SCALING.md)")
    } else if (spark.conf.get("spark.sql.adaptive.enabled", "true") == "true") {
      log.warn("graft SessionGuard: AQE is enabled — do NOT share this " +
        "SparkSession with code that may call clearCache() mid-query " +
        "(measured silent-empty-result hazard; SCALING.md 'Known " +
        "hazards'). Call SessionGuard.verify() at stage boundaries, or " +
        "install(enforceAqeOff = true).")
    }
    canaries.computeIfAbsent(spark, { s =>
      val c = s.range(1).toDF("graft_cache_canary")
      c.persist(StorageLevel.MEMORY_ONLY)
      c.count() // eager: a lazy persist isn't yet visible to clearCache
      c
    })
  }

  /** True iff the canary installed on `spark` is still cached. False —
    * with a WARN and an observed metric — means someone cleared the
    * session's caches since install: treat concurrently-running cached
    * queries' results as suspect and re-run them.
    */
  def verify(spark: SparkSession): Boolean = {
    val c = canaries.get(spark)
    require(c != null, "SessionGuard.verify before install")
    val ok = c.storageLevel != StorageLevel.NONE
    if (!ok) {
      ConvergenceMetrics.record("sessionGuard.clearCache",
        "cache canary evicted: clearCache() happened since install; " +
          "in-flight cached-plan queries may have silently emptied")
    }
    ok
  }

  /** Test hook: drop the canary registration for `spark`. */
  def reset(spark: SparkSession): Unit = {
    Option(canaries.remove(spark)).foreach(_.unpersist(false))
  }
}
