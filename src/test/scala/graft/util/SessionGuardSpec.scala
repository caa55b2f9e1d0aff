package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The clearCache/AQE hazard guard (SCALING.md "Known hazards"): the
  * canary detects an out-of-band clearCache, enforce mode flips AQE off,
  * and graft's own scoped persists never trip it.
  */
class SessionGuardSpec extends AnyFunSuite with SparkTestBase {

  test("canary detects a hostile clearCache; graft's scoped persists don't trip it") {
    SessionGuard.reset(spark)
    ConvergenceMetrics.reset("sessionGuard.clearCache")
    SessionGuard.install(spark)
    assert(SessionGuard.verify(spark), "fresh install must verify clean")

    // graft's own cache discipline (scoped persist + unpersist) must not
    // look like the hazard
    val scoped = AutoUnpersist.persistScoped(
      spark.range(10).toDF("x"))
    scoped.count()
    scoped.unpersist(false)
    assert(SessionGuard.verify(spark),
      "library-managed persists must not trip the canary")
    assert(ConvergenceMetrics.unconvergedCount("sessionGuard.clearCache") == 0)

    // the hazard's trigger: someone clears ALL session caches
    spark.catalog.clearCache()
    assert(!SessionGuard.verify(spark),
      "clearCache must evict the canary and be detected")
    assert(ConvergenceMetrics.unconvergedCount("sessionGuard.clearCache") == 1,
      "detection must be recorded as an observed metric")
    SessionGuard.reset(spark)
    ConvergenceMetrics.reset("sessionGuard.clearCache")
  }

  test("enforce mode disables AQE for the session (the only measured-sufficient mitigation)") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      SessionGuard.reset(spark)
      SessionGuard.install(spark, enforceAqeOff = true)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(SessionGuard.verify(spark))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      SessionGuard.reset(spark)
    }
  }
}
