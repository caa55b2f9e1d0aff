package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DataQualitySpec extends AnyFunSuite with SparkTestBase {

  test("checks count violations exactly; null FKs are not orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(
      (Some(1L), 5.0, "A"), (Some(2L), 55.0, "B"),
      (Some(9L), 7.0, "Z"),            // orphan fk, out-of-set flag
      (None, -1.0, "A")                // null fk → NOT an orphan; range viol
    ).toDF("fk", "v", "flag")
    def one(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getLong(1), r.getLong(2), r.getBoolean(3))
    }
    assert(one(DataQuality.orphans(child, "fk", parent, "pk", "fk")) ==
      ((4L, 1L, false)))
    assert(one(DataQuality.inRange(child, "v", lit(0.0), lit(50.0), "r")) ==
      ((4L, 2L, false)))
    assert(one(DataQuality.accepted(child, "flag", Seq("A", "B"), "a")) ==
      ((4L, 1L, false)))
    assert(one(DataQuality.notNull(child, "fk", "n")) == ((4L, 1L, false)))
    assert(one(DataQuality.unique(child.select(col("flag")), "flag", "u")) ==
      ((4L, 1L, false)))  // "A" appears twice → one surplus row
    assert(one(DataQuality.unique(parent, "pk", "u2")) == ((2L, 0L, true)))
  }

  test("aucBp: perfect order, inverted order, hand-computed ties, and " +
    "the single-class NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def auc(rows: Seq[(Long, Boolean)]) =
      DataQuality.aucBp(rows.toDF("s", "y"), col("y"), "s").collect()(0)
    val perfect = auc(Seq((3L, true), (4L, true), (1L, false), (2L, false)))
    assert(perfect.getAs[Long]("auc_bp") == 10000L &&
      perfect.getAs[Long]("n_pos") == 2L)
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false)))
      .getAs[Long]("auc_bp") == 0L)
    // pos {2,3}, neg {1,3}: wins 2, tie 0.5 → 2.5/4 = 0.625
    assert(auc(Seq((2L, true), (3L, true), (1L, false), (3L, false)))
      .getAs[Long]("auc_bp") == 6250L)
    val oneClass = auc(Seq((1L, true), (2L, true)))
    assert(oneClass.isNullAt(oneClass.fieldIndex("auc_bp")))
  }

  test("ksTestBp: identical 0, disjoint 10000, hand-computed half shift, " +
    "empty-side NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ks(rows: Seq[(Long, Boolean)]) =
      DataQuality.ksTestBp(rows.toDF("s", "a"), col("a"), "s").collect()(0)
    // identical distributions → D = 0
    assert(ks(Seq((1L, true), (2L, true), (1L, false), (2L, false)))
      .getAs[Long]("d_bp") == 0L)
    // disjoint supports → D = 1
    val disj = ks(Seq((1L, true), (1L, true), (5L, false), (5L, false)))
    assert(disj.getAs[Long]("d_bp") == 10000L &&
      disj.getAs[Long]("n_a") == 2L && disj.getAs[Long]("n_b") == 2L)
    // a = {0,1}, b = {1,2}: CDFs at 0 → (.5, 0), at 1 → (1, .5): D = .5
    assert(ks(Seq((0L, true), (1L, true), (1L, false), (2L, false)))
      .getAs[Long]("d_bp") == 5000L)
    // one side empty → undefined, NULL
    val empty = ks(Seq((1L, true), (2L, true)))
    assert(empty.isNullAt(empty.fieldIndex("d_bp")))
  }

  test("calibrationBins: bin edges, rates, and signed gaps on a hand " +
    "fixture; overconfident scores show negative gaps") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (Seq((500L, false)) ++
      Seq((9500L, true), (9500L, true), (9500L, true), (9500L, false)))
      .toDF("s", "y")
    val out = DataQuality.calibrationBins(rows, col("y"), "s")
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(0L, 9L))
    assert(out(0L).getAs[Long]("n") == 1L &&
      out(0L).getAs[Long]("pos_rate_bp") == 0L &&
      out(0L).getAs[Long]("gap_bp") == -500L)
    val b9 = out(9L)
    assert(b9.getAs[Long]("n") == 4L && b9.getAs[Long]("n_pos") == 3L)
    assert(b9.getAs[Long]("mean_score_bp") == 9500L &&
      b9.getAs[Long]("pos_rate_bp") == 7500L &&
      b9.getAs[Long]("gap_bp") == -2000L) // claims 95%, delivers 75%
    // out-of-range scores clamp into edge bins
    val clamped = DataQuality.calibrationBins(
      Seq((-50L, false), (12000L, true)).toDF("s", "y"), col("y"), "s")
      .collect().map(_.getAs[Long]("bin")).toSet
    assert(clamped == Set(0L, 9L))
  }

  test("bootstrapCI: brackets the mean, collapses on constants, narrows " +
    "with sample size, and replays deterministically") {
    import spark.implicits._
    // two groups: 'small' n=25 and 'big' n=400, same value process
    val rows = ((0 until 25).map(i => ("small", i.toLong, 100L + (i % 10))) ++
      (0 until 400).map(i => ("big", 1000L + i, 100L + (i % 10))))
      .toDF("grp", "id", "v")
    val out = DataQuality.bootstrapCI(rows, "v", "grp", "id", b = 100)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    Seq("small", "big").foreach { g =>
      val r = out(g)
      assert(r.getAs[Long]("ci_lo_micro") <= r.getAs[Long]("mean_micro") &&
        r.getAs[Long]("mean_micro") <= r.getAs[Long]("ci_hi_micro"), g)
      assert(r.getAs[Long]("b_effective") == 100L)
    }
    def width(g: String) =
      out(g).getAs[Long]("ci_hi_micro") - out(g).getAs[Long]("ci_lo_micro")
    assert(width("big") * 2 < width("small"),
      s"CI must narrow with n: big ${width("big")} vs small ${width("small")}")

    // constant column: every replicate mean is the constant — zero width
    val const = (0 until 50).map(i => ("c", i.toLong, 7L)).toDF("grp", "id", "v")
    val rc = DataQuality.bootstrapCI(const, "v", "grp", "id", b = 50)
      .collect()(0)
    assert(rc.getAs[Long]("ci_lo_micro") == 7000000L &&
      rc.getAs[Long]("ci_hi_micro") == 7000000L)

    // determinism
    val again = DataQuality.bootstrapCI(rows, "v", "grp", "id", b = 100)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("ci_lo_micro"), r.getAs[Long]("ci_hi_micro"))).toMap
    assert(again("small") ==
      (out("small").getAs[Long]("ci_lo_micro"),
        out("small").getAs[Long]("ci_hi_micro")))
  }

  test("robustMean: one outlier drags the mean, not the trimmed or " +
    "winsorized forms; k=0 collapses all three; ties are stable") {
    import spark.implicits._
    // 0,10,..,90 plus a 100000 outlier: n = 11, trim 10% → k = 1
    val rows = ((0 to 9).map(i => ("a", i * 10L)) :+ ("a" -> 100000L))
      .toDF("source", "score_bp")
    val r = DataQuality.robustMean(rows, "source", "score_bp",
      trimBp = 1000).collect()(0)
    assert(r.getAs[Long]("n") == 11L)
    assert(r.getAs[Long]("mean_bp") == 100450L / 11L)  // 9131 — dragged
    assert(r.getAs[Long]("trimmed_mean_bp") == 50L)    // outlier cut
    assert(r.getAs[Long]("winsor_mean_bp") == 50L)     // clamped to 90
    assert(r.getAs[Long]("lo_bp") == 10L && r.getAs[Long]("hi_bp") == 90L)
    // k = 0 (tiny group): all three estimators coincide with the mean
    val small = DataQuality.robustMean(
      Seq(("b", 4L), ("b", 8L)).toDF("source", "score_bp"),
      "source", "score_bp", trimBp = 1000).collect()(0)
    assert(small.getAs[Long]("mean_bp") == 6L &&
      small.getAs[Long]("trimmed_mean_bp") == 6L &&
      small.getAs[Long]("winsor_mean_bp") == 6L)
    // all-tied values: every estimator is the value
    val tied = DataQuality.robustMean(
      Seq.fill(4)(("c", 5L)).toDF("source", "score_bp"),
      "source", "score_bp", trimBp = 2500).collect()(0)
    assert(tied.getAs[Long]("trimmed_mean_bp") == 5L &&
      tied.getAs[Long]("winsor_mean_bp") == 5L &&
      tied.getAs[Long]("lo_bp") == 5L && tied.getAs[Long]("hi_bp") == 5L)
  }

  test("gini: equality at 0, hand values, concentration toward 1, " +
    "all-zero NULL, groups independent") {
    import spark.implicits._
    val out = DataQuality.gini(Seq(
      ("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("hand", 1L), ("hand", 2L), ("hand", 3L), ("hand", 4L),
      ("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 12L),
      ("zero", 0L), ("zero", 0L)
    ).toDF("g", "v"), "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("eq").getAs[Long]("gini_bp") == 0L)
    // sorted 1,2,3,4: (2·30 − 5·10)·10⁴ / (4·10) = 2500
    assert(out("hand").getAs[Long]("gini_bp") == 2500L &&
      out("hand").getAs[Long]("total") == 10L)
    // 0,0,0,12: (2·48 − 5·12)·10⁴ / (4·12) = 7500
    assert(out("conc").getAs[Long]("gini_bp") == 7500L)
    assert(out("zero").isNullAt(out("zero").fieldIndex("gini_bp")))
  }

  test("spearmanBp: monotone ±10000, hand-computed tied case, degenerate " +
    "constant column NULL") {
    import spark.implicits._
    def one(df: org.apache.spark.sql.DataFrame) = df.collect().head
    val up = one(DataQuality.spearmanBp(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("a", "b"),
      "a", "b"))
    assert(up.getAs[Long]("n") == 4L && up.getAs[Long]("rho_bp") == 10000L &&
      up.getAs[Long]("rho2_e8") == 100000000L &&
      up.getAs[Long]("n_distinct_a") == 4L)
    val down = one(DataQuality.spearmanBp(
      Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("a", "b"),
      "a", "b"))
    assert(down.getAs[Long]("rho_bp") == -10000L)
    // a=[1,1,2] → rank2 x=[3,3,6]; b=[1,2,2] → rank2 y=[2,5,5];
    // num = 3·51 − 12·12 = 9, dx = dy = 18 → ρ = 0.5 exactly:
    // (90000 div 18)² = 5000² = 25 000 000, √ = 5000
    val tied = one(DataQuality.spearmanBp(
      Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("a", "b"), "a", "b"))
    assert(tied.getAs[Long]("rho2_e8") == 25000000L &&
      tied.getAs[Long]("rho_bp") == 5000L &&
      tied.getAs[Long]("n_distinct_a") == 2L &&
      tied.getAs[Long]("n_distinct_b") == 2L)
    val const = one(DataQuality.spearmanBp(
      Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("a", "b"), "a", "b"))
    assert(const.isNullAt(const.fieldIndex("rho_bp")) &&
      const.isNullAt(const.fieldIndex("rho2_e8")))
  }

  test("pairedPermTest: null-effect deltas give p = 10000; a uniform " +
    "one-sided effect leaves zero extreme replicas (add-one p)") {
    import spark.implicits._
    def one(df: org.apache.spark.sql.DataFrame) = df.collect().head
    // all-zero deltas: every replica total equals |t_obs| = 0 → every
    // replica is "extreme" → p = (200+1)·10⁴ div 201 = 10000
    val nil = one(DataQuality.pairedPermTest(
      (1L to 30L).map(i => (i, 0L)).toDF("id", "d"), "id", "d", 200))
    assert(nil.getAs[Long]("t_obs") == 0L &&
      nil.getAs[Long]("n_extreme") == 200L &&
      nil.getAs[Long]("p_bp") == 10000L)
    // forty +1 deltas: a replica reaches |40| only if all 40 md5
    // parities agree — no replica does, so p = 1·10⁴ div 201 = 49
    val strong = one(DataQuality.pairedPermTest(
      (1L to 40L).map(i => (i, 1L)).toDF("id", "d"), "id", "d", 200))
    assert(strong.getAs[Long]("t_obs") == 40L &&
      strong.getAs[Long]("n_extreme") == 0L &&
      strong.getAs[Long]("p_bp") == 49L)
  }

  test("benford: digit extraction, spine densification, literal shares") {
    import spark.implicits._
    // 100..199 (digit 1) ×2, 20..29 (digit 2) ×1, one 0.4 dropped
    val vals = ((100 to 199) ++ (100 to 199) ++ (20 to 29))
      .map(_.toDouble) :+ 0.4
    val out = DataQuality.benford(vals.toDF("v"), "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 9) // densified spine
    assert(out(1) == ((200L, 210L, 200L * 10000 / 210, 3010L)))
    assert(out(2)._1 == 10L && out(2)._4 == 1760L)
    assert(out(3) == ((0L, 210L, 0L, 1249L))) // absent digit, obs 0
    // shares sum to ~1: nine floors lose at most 9 bp in total
    assert(DataQuality.benfordBp.values.sum >= 9991L &&
      DataQuality.benfordBp.values.sum <= 10000L)
  }

  test("wilsonCi: hand values at p=1 and p=1/2; bounds clamp and " +
    "bracket p_bp; tiny groups get wide intervals") {
    import spark.implicits._
    val df = (
      (1 to 16).map(i => ("half", i % 2 == 0)) ++ // k=8, n=16
      (1 to 4).map(_ => ("all", true))            // k=n=4
    ).toDF("g", "ok")
    val out = DataQuality.wilsonCi(df, "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // p̂=1, n=4: upper clamps to 10⁴; lower = n/(n+z²) = 4/7.8416 ≈ 0.51
    val all = out("all")
    assert(all._3 == 10000L && all._5 == 10000L)
    assert(all._4 >= 5000L && all._4 <= 5200L) // textbook ≈ 0.5101
    // p̂=1/2, n=16: symmetric-ish interval ≈ [0.28, 0.72]
    val half = out("half")
    assert(half._3 == 5000L)
    assert(half._4 >= 2700L && half._4 <= 3000L &&
      half._5 >= 7000L && half._5 <= 7300L)
    assert(half._4 < half._3 && half._3 < half._5)
  }

  test("mcnemar: discordant-cell chi2 hand value; all-concordant NULL") {
    import spark.implicits._
    def one(df: org.apache.spark.sql.DataFrame) = df.collect().head
    val m = one(DataQuality.mcnemar(
      Seq((true, true), (true, false), (true, false), (false, true),
        (false, false)).toDF("a", "b"), col("a"), col("b")))
    // n01 = 2, n10 = 1 → (2−1)²·100 div 3 = 33
    assert(m.getAs[Long]("n") == 5L && m.getAs[Long]("n01") == 2L &&
      m.getAs[Long]("n10") == 1L && m.getAs[Long]("chi2_x100") == 33L)
    val agree = one(DataQuality.mcnemar(
      Seq((true, true), (false, false)).toDF("a", "b"),
      col("a"), col("b")))
    assert(agree.isNullAt(agree.fieldIndex("chi2_x100")))
  }
}
