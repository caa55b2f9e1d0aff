package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PrivacySpec extends AnyFunSuite with SparkTestBase {

  test("kAnonymity: subject counts drive k-risk; sensitive spread drives l-risk") {
    import spark.implicits._
    val rows = Seq(
      // ("zip", "age") QI; subject; diagnosis sensitive
      ("10001", 30, "u1", "flu"), ("10001", 30, "u2", "cold"),
      ("10001", 30, "u3", "flu"),                         // 3 subjects ≥ k
      ("10002", 40, "u4", "flu"), ("10002", 40, "u4", "flu"), // 1 subject, uniform
      ("10003", 50, "u5", "flu"), ("10003", 50, "u6", "flu"),
      ("10003", 50, "u7", "flu")                          // k ok, l fails
    ).toDF("zip", "age", "subject", "diag")
    val got = Privacy.kAnonymity(rows, Seq("zip", "age"), "subject", "diag",
        k = 3, l = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5),
          r.getBoolean(6)))
      .toMap
    assert(got(("10001", 30)) == ((3L, 3L, 2L, false, false)))
    // two rows but ONE subject — row count must not mask the risk
    assert(got(("10002", 40)) == ((2L, 1L, 1L, true, true)))
    assert(got(("10003", 50)) == ((3L, 3L, 1L, false, true)))
  }

  test("forgetByContent: request purges the id, its content mirrors, " +
      "and the index rows; unrelated docs survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the secret document"),
      (2L, "the secret document"), // mirror of 1 under another id
      (3L, "an innocent doc"),
      (4L, "another innocent doc")).toDF("doc_id", "text")
    val index = Seq((1L, "sigA"), (2L, "sigA"), (3L, "sigB"), (4L, "sigC"))
      .toDF("doc_id", "m0")
    val requests = Seq(Tuple1(1L)).toDF("doc_id")
    val (pc, pi, audit) =
      graft.ops.Privacy.forgetByContent(corpus, index, requests)
    // mirror 2 purged via content expansion despite never being named
    assert(pc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(3L, 4L))
    assert(pi.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(3L, 4L))
    val a = audit.collect().head
    // (before, requests, forgotten, after, idx_before, idx_after,
    //  residual, orphans)
    assert((0 to 7).map(a.getLong).toSeq
      == Seq(4L, 1L, 2L, 2L, 4L, 2L, 0L, 0L), a.toString)
  }

  test("dpNoisyCounts: seeded noise is deterministic, roughly centered, " +
    "clamped at zero, and scales with alpha") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 200 groups of 30 rows each
    val rows = (0 until 6000).map(i => s"g${i % 200}").toDF("grp")
    def release(alphaBp: Long) =
      Privacy.dpNoisyCounts(rows, "grp", alphaBp)
        .collect().map(r => r.getAs[String]("grp") ->
          r.getAs[Long]("noisy_count")).toMap

    val r9 = release(9000L)
    assert(r9.size == 200 && r9.values.forall(_ >= 0L))
    // reruns release the identical table — no RNG state anywhere
    assert(release(9000L) == r9)
    // noise is two-sided and roughly centered: with α=0.9 (std ≈ 13)
    // over 200 groups the mean residual has SE ≈ 1
    val noise9 = r9.values.map(_ - 30L)
    assert(noise9.exists(_ > 0L) && noise9.exists(_ < 0L))
    assert(math.abs(noise9.sum.toDouble / 200) < 4.0,
      s"noise not centered: mean ${noise9.sum / 200.0}")
    // a smaller α (stronger decay, smaller ε-noise... larger ε) shrinks
    // the spread: mean |noise| at α=0.2 far below α=0.9
    val noise2 = release(2000L).values.map(c => math.abs(c - 30L))
    assert(noise2.sum * 5 < noise9.map(math.abs(_)).sum,
      s"alpha must control spread: ${noise2.sum} vs ${noise9.map(math.abs(_)).sum}")
    // seed change re-draws
    val other = Privacy.dpNoisyCounts(rows, "grp", 9000L, seed = "dp2")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("noisy_count")).toMap
    assert(other != r9)
  }
}
