package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Deequ-style audit a
  * warehouse load runs before publishing: key uniqueness, referential
  * integrity, null discipline, range and accepted-value rules. Each
  * check is one aggregation over one table (map-side combinable; the
  * orphan check is one left join against the parent's distinct keys,
  * broadcastable when the parent is a dimension) returning the uniform
  * row (check, n_checked, n_violations, pass) — so a full audit is a
  * UNION of independent single-pass checks, each prunable to the
  * columns it reads, and the report is checks-sized however large the
  * tables are.
  */
object DataQuality {

  private def report(name: String, checked: Column, viol: Column)(
      df: DataFrame): DataFrame =
    df.agg(checked.as("n_checked"), viol.as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** Duplicate-key volume: rows beyond the first per key value. */
  def unique(df: DataFrame, keyCol: String, name: String): DataFrame =
    report(name, count(lit(1)),
      count(col(keyCol)) - countDistinct(col(keyCol)))(df)

  /** Foreign-key orphans: child rows whose non-null `fkCol` has no
    * match in the parent's `pkCol` (null FKs are not orphans).
    */
  def orphans(
      child: DataFrame, fkCol: String, parent: DataFrame, pkCol: String,
      name: String
  ): DataFrame = {
    val p = parent.select(col(pkCol).as("_pk")).distinct()
    report(name, count(lit(1)),
      sum(when(col(fkCol).isNotNull && col("_pk").isNull, 1L)
        .otherwise(0L)))(
      child.select(col(fkCol)).join(p, col(fkCol) === col("_pk"), "left"))
  }

  /** Non-null values outside [lo, hi]. */
  def inRange(
      df: DataFrame, c: String, lo: Column, hi: Column, name: String
  ): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)))(df)

  /** Non-null values outside the accepted set. */
  def accepted(
      df: DataFrame, c: String, values: Seq[String], name: String
  ): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
        .otherwise(0L)))(df)

  /** Null discipline. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c).isNull, 1L).otherwise(0L)))(df)

  /** Mann-Whitney (rank-sum) AUC in exact basis points — the standard
    * "does this score order the classes" readout for a quality/filter
    * classifier: AUC = P(score⁺ > score⁻) + ½P(tie), computed WITHOUT
    * any corpus-sized ranking. The score column collapses to its value
    * domain first (per-score positive/negative counts), then one
    * cumulative window over that bounded domain gives, for every score,
    * the negatives strictly below it:
    *
    *   auc_bp = (2·Σ p_s·cumneg_s + Σ p_s·n_s) · 10⁴ div (2·P·N)
    *
    * — pairs won plus half-credit ties, an exact integer any engine
    * replays. The window is unpartitioned BY DESIGN but runs over the
    * score DOMAIN (basis-point scores: ≤ 10001 rows — the curriculum
    * decomposition precedent), never the corpus. Single-class inputs
    * (P or N = 0) return a NULL auc_bp — the honest undefined.
    *
    * Overflow bound: the pair count P·N leaves BIGINT at ~3·10⁷ docs
    * per class, well inside corpus scale, so the win/tie sums and the
    * final ratio run in DECIMAL(38,0) (DuckDB mirror: HUGEINT) — exact
    * integer arithmetic to ~10³⁴ pairs, i.e. ~10¹⁷ docs per class,
    * beyond any corpus. Outputs stay BIGINT.
    *
    * Out: one row `(n_pos, n_neg, auc_bp)`.
    */
  def aucBp(scored: DataFrame, label: Column,
      scoreCol: String): DataFrame = {
    val cells = scored
      .select(col(scoreCol).as("_s"), when(label, 1L).otherwise(0L).as("_y"))
      .groupBy("_s").agg(sum(col("_y")).as("_p"),
        sum(expr("1 - _y")).as("_n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    cells
      .withColumn("_cn", coalesce(sum(col("_n")).over(w), lit(0L)))
      .agg(sum(col("_p")).as("n_pos"), sum(col("_n")).as("n_neg"),
        sum(expr("cast(_p as decimal(38,0)) * _cn")).as("_wins"),
        sum(expr("cast(_p as decimal(38,0)) * _n")).as("_ties"))
      .withColumn("auc_bp",
        expr("if(n_pos > 0 and n_neg > 0, " +
          "cast((2 * _wins + _ties) * 10000 div " +
          "(2 * cast(n_pos as decimal(38,0)) * n_neg) as bigint), null)"))
      .select("n_pos", "n_neg", "auc_bp")
  }

  /** Two-sample Kolmogorov–Smirnov statistic in exact basis points —
    * the distribution-shift readout next to [[aucBp]] (AUC asks "does
    * the score separate the LABELS"; KS asks "did the score's
    * DISTRIBUTION move between two corpus slices" — snapshot vs
    * snapshot, source vs source, the drift gate's offline twin):
    *
    *   D = sup_x |F_a(x) − F_b(x)|,  d_bp = ⌊10⁴·D⌋
    *
    * computed WITHOUT a corpus ranking: both sides collapse to the
    * score's VALUE DOMAIN first (per-score a/b counts), one cumulative
    * window over that bounded domain gives both empirical CDFs, and the
    * sup is max|cum_a·n_b − cum_b·n_a| — exact integers throughout
    * (DECIMAL(38,0) for the cross products: cum·n exits BIGINT at
    * ~3·10⁹ docs per side). The window is unpartitioned BY DESIGN but
    * runs over the score domain (basis-point scores: ≤ 10001 rows —
    * the [[aucBp]] precedent), never the corpus.
    *
    * Either side empty → NULL d_bp (the honest undefined).
    *
    * Out: one row `(n_a, n_b, d_bp)`.
    */
  def ksTestBp(scored: DataFrame, sideA: Column,
      scoreCol: String): DataFrame = {
    val cells = scored
      .select(col(scoreCol).as("_s"), when(sideA, 1L).otherwise(0L).as("_x"))
      .groupBy("_s").agg(sum(col("_x")).as("_a"),
        sum(expr("1 - _x")).as("_b"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("_ca", sum(col("_a")).over(w))
      .withColumn("_cb", sum(col("_b")).over(w))
      .withColumn("_na", sum(col("_a")).over(wAll))
      .withColumn("_nb", sum(col("_b")).over(wAll))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        max(abs(expr("cast(_ca as decimal(38,0)) * _nb " +
          "- cast(_cb as decimal(38,0)) * _na"))).as("_gap"))
      .withColumn("d_bp",
        expr("if(n_a > 0 and n_b > 0, cast(_gap * 10000 div " +
          "(cast(n_a as decimal(38,0)) * n_b) as bigint), null)"))
      .select("n_a", "n_b", "d_bp")
  }

  /** Paired permutation (sign-flip) significance test for a per-item
    * metric delta — THE assumption-free "is system A actually better
    * than system B" readout for eval suites (bootstrap CIs say how wide;
    * this says how likely under the no-difference null). Null model:
    * each item's delta has a random sign; the observed total is extreme
    * if few of `reps` sign-flipped replicas reach it.
    *
    * Deterministic and engine-replayable: replica r flips item i's sign
    * by the parity of md5(i:r)'s first hex digit (the md5-keyed
    * determinism precedent — no RNG, any engine replays every replica),
    * and the p-value uses the standard add-one form
    *
    *   p_bp = (|{r : |T_r| ≥ |T_obs|}| + 1)·10⁴ div (reps + 1)
    *
    * (the observed labeling counts as one replica, so p never reads 0).
    *
    * Shape: items explode ×reps then aggregate straight back to `reps`
    * rows with map-side partial sums — corpus-linear work, reps-sized
    * state, no corpus shuffle (the groupBy key domain IS the replica
    * id). Overflow: |T_r| ≤ Σ|δ| ≈ 10⁴·n — BIGINT to n ≈ 10¹⁴ items.
    *
    * In: one row per item; `deltaCol` = metric_A − metric_B (integer).
    * Out: one row `(n, t_obs, n_extreme, p_bp)`.
    */
  def pairedPermTest(pairs: DataFrame, idCol: String, deltaCol: String,
      reps: Int = 200): DataFrame = {
    require(reps >= 1, s"need at least one replica: $reps")
    val obs = pairs.agg(count(lit(1)).as("n"),
      sum(col(deltaCol)).as("t_obs"))
    val flips = pairs
      .select(col(idCol).cast("string").as("_id"),
        col(deltaCol).cast("long").as("_d"))
      .withColumn("_r", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("_sign",
        when(pmod(conv(substring(md5(concat(col("_id"), lit(":"),
          col("_r").cast("string"))), 1, 1), 16, 10).cast("long"),
          lit(2)) === 0, lit(1L)).otherwise(lit(-1L)))
      .groupBy("_r").agg(sum(expr("_sign * _d")).as("_t"))
    obs.crossJoin( // single-row × reps-row aggregate of an aggregate
        flips.crossJoin(obs.select(abs(col("t_obs")).as("_abs_obs")))
          .agg(sum(when(abs(col("_t")) >= col("_abs_obs"), 1L)
            .otherwise(0L)).as("n_extreme")))
      .withColumn("p_bp",
        expr(s"(n_extreme + 1) * 10000 div (${reps}L + 1)"))
      .select("n", "t_obs", "n_extreme", "p_bp")
  }

  /** Benford first-digit probabilities in basis points:
    * floor(10⁴·log₁₀(1 + 1/d)) for d = 1..9 — computed ONCE driver-side
    * (the nDCG integer-literal precedent) so no engine evaluates a log.
    */
  val benfordBp: Map[Int, Long] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong).toMap

  /** Benford first-digit audit — the classic "are these numbers
    * organic" screen for synthetic, fabricated, or truncated numeric
    * columns (naturally-occurring multi-magnitude amounts follow
    * log-uniform first digits; generated or clipped data usually
    * doesn't). Values < 1 are excluded (no stable first digit in this
    * integer formulation); the first digit comes from the decimal
    * string of floor(v) — pure per-row projection, no log calls.
    *
    * Output is densified over the full 1..9 digit spine (an absent
    * digit is the loudest signal), with expected shares from
    * [[benfordBp]] and the per-digit deviation:
    *
    *   dev_bp = |obs·10⁴ div n − exp_bp|
    *
    * Shape: one filtered projection + a 9-key groupBy + a 1-row total
    * aggregate broadcast over the 9-row spine. Bounded output forever.
    *
    * Out: `(digit, obs, n, obs_bp, exp_bp, dev_bp)`, 9 rows.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val obs = df
      .select(floor(col(valueCol)).cast("long").as("_v"))
      .filter(col("_v") >= 1)
      .select(substring(col("_v").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val total = obs.agg(sum(col("obs")).as("n"))
    val expCase = (1 to 9).map(d => s"WHEN digit = $d THEN ${benfordBp(d)}L")
      .mkString("CASE ", " ", " END")
    df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(obs, Seq("digit"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(total)
      .withColumn("obs_bp", expr("obs * 10000 div n"))
      .withColumn("exp_bp", expr(expCase))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      .select("digit", "obs", "n", "obs_bp", "exp_bp", "dev_bp")
      .orderBy("digit")
  }

  /** Wilson score interval per group for a boolean pass rate — the
    * honest error bar on "94% of this source passes the quality gate"
    * when some groups have 40 docs and others 40 million (a plain ±z·se
    * bar lies at small n and at p near 0/1; Wilson doesn't). Quantized
    * integer form with z² fixed at `z2X1e4`/10⁴ (default 38416 → 95%):
    *
    *   bound_bp = 10⁴·(2·10⁴·k + A ± 2·S) div (2·(10⁴·n + A)),
    *   S = floor(sqrt(A·((10⁴·k·(n−k)) div n) + A² div 4)),  A = z2X1e4
    *
    * The sqrt runs on an IEEE double both engines evaluate identically;
    * its argument stays inside double-exact range (< 2⁵³) to
    * n ≈ 5·10⁶ per group — past that the bound can drift by 1 bp
    * (the rate itself, never the ordering). Bounds clamp to [0, 10⁴].
    *
    * Shape: one map-side-combinable aggregation per group; output is
    * group-domain-sized.
    *
    * Out: `(groupCol, n, k, p_bp, lo_bp, hi_bp)`.
    */
  def wilsonCi(df: DataFrame, groupCol: String, ok: Column,
      z2X1e4: Long = 38416L): DataFrame = {
    require(z2X1e4 > 0, s"z2X1e4 must be positive: $z2X1e4")
    val a = z2X1e4
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(ok, 1L).otherwise(0L)).as("k"))
      .withColumn("p_bp", expr("k * 10000 div n"))
      // the 10000·k·(n−k) product is staged in DECIMAL(38,0): as BIGINT
      // it silently exceeds 2⁶³ for groups beyond ~6·10⁷ rows (ANSI:
      // query failure; legacy: a negative operand and NaN sqrt). The
      // decimal floor-quotient equals the BIGINT `div` wherever the
      // BIGINT form was valid, so small-group results are bit-identical.
      .withColumn("_s", expr(
        s"cast(floor(sqrt(cast(${a}L * " +
          "floor((cast(10000 as decimal(38,0)) * k * (n - k)) / n) " +
          s"+ (${a}L * ${a}L) div 4 as double))) as bigint)"))
      .withColumn("lo_bp", greatest(lit(0L), expr(
        s"10000 * (2 * 10000 * k + ${a}L - 2 * _s) " +
          s"div (2 * (10000 * n + ${a}L))")))
      .withColumn("hi_bp", least(lit(10000L), expr(
        s"10000 * (2 * 10000 * k + ${a}L + 2 * _s) " +
          s"div (2 * (10000 * n + ${a}L))")))
      .select(col(groupCol), col("n"), col("k"), col("p_bp"),
        col("lo_bp"), col("hi_bp"))
  }

  /** McNemar's test on paired boolean outcomes — "did switching systems
    * actually change which items pass": only the DISCORDANT cells
    * matter (n01 = A right / B wrong, n10 = the reverse), and the
    * statistic is exact integer arithmetic any engine replays:
    *
    *   chi2_x100 = (n01 − n10)²·100 div (n01 + n10)
    *
    * (≈3.84 ⇒ p < 0.05 under χ²₁ — the caller compares against 384).
    * NULL when there are no discordant items (nothing changed —
    * undefined, not significant). One map-side-combinable aggregation;
    * for calibrated p-values on small counts use [[pairedPermTest]] on
    * the ±1 discordance deltas instead.
    *
    * Out: one row `(n, n01, n10, chi2_x100)`.
    */
  def mcnemar(paired: DataFrame, okA: Column, okB: Column): DataFrame =
    paired
      .agg(count(lit(1)).as("n"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("n01"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("n10"))
      .withColumn("chi2_x100",
        expr("if(n01 + n10 > 0, " +
          "(n01 - n10) * (n01 - n10) * 100 div (n01 + n10), null)"))
      .select("n", "n01", "n10", "chi2_x100")

  /** Spearman rank correlation between two integer-quantized score
    * columns — the "do these two quality signals agree on ORDER"
    * readout (classifier vs heuristic, new scorer vs old) that
    * [[aucBp]] (needs a label) and [[ksTestBp]] (distribution, not
    * order) don't give. Average-rank tie handling via the doubled-rank
    * trick: for value v with `c` occurrences and `C` items below,
    * rank2 = 2·avgrank = 2C + c + 1 — integer always, so both rank
    * maps stay exact.
    *
    * Pearson on the doubled ranks, quantized deterministically:
    *
    *   num = n·Σxy − Σx·Σy,  dx = n·Σx² − (Σx)²,  dy likewise
    *   rho2_e8 = sign(num)·(|num|·10⁴ div dx)·(|num|·10⁴ div dy)
    *   rho_bp  = sign·floor(√|rho2_e8|)
    *
    * (the quotient product is already ρ²·10⁸ by Cauchy–Schwarz — each
    * factor is ρ·√(dy/dx)·10⁴ resp. ρ·√(dx/dy)·10⁴ — so no rescale).
    *
    * Two truncating divisions instead of one irrational √(dx·dy) — every
    * digit deterministic on any engine (the [[ksTestBp]] DECIMAL
    * discipline; |rho2_e8| ≤ 10⁸, and floor(√v) on a BIGINT ≤ 10⁸ is
    * provably exact in IEEE double: the nearest non-square distance to
    * an integer root is ~1/(2·10⁴) ≫ one ulp). Rank sums run in
    * DECIMAL(38,0): Σxy ~ 4n³ exits BIGINT at n ≈ 1.3·10⁵, DECIMAL at
    * n ≈ 10⁸ — past that, pre-aggregate to a coarser score domain.
    * Degenerate columns (one distinct value: dx or dy = 0) → NULL.
    *
    * Shape: the corpus collapses to each score's VALUE domain first;
    * the two cumulative windows run over those bounded domains (the
    * [[aucBp]] precedent — intended for bp-like quantized scores, never
    * raw floats), then two equi-joins map ranks back and one aggregate
    * folds the moments.
    *
    * Out: one row `(n, n_distinct_a, n_distinct_b, rho2_e8, rho_bp)`.
    */
  def spearmanBp(scored: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rankMap(c: String): DataFrame = {
      val w = Window.orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
      scored.select(col(c).cast("long").as("_v"))
        .groupBy("_v").agg(count(lit(1)).as("_c"))
        .withColumn("_rank2",
          coalesce(sum(col("_c")).over(w), lit(0L)) * 2 + col("_c") + 1)
        .select(col("_v"), col("_rank2"))
    }
    val ra = rankMap(aCol)
    val rb = rankMap(bCol)
    val ranked = scored
      .select(col(aCol).cast("long").as("_va"), col(bCol).cast("long").as("_vb"))
      .join(ra.withColumnRenamed("_v", "_va")
        .withColumnRenamed("_rank2", "_x"), Seq("_va"))
      .join(rb.withColumnRenamed("_v", "_vb")
        .withColumnRenamed("_rank2", "_y"), Seq("_vb"))
    // distinct-value counts stay LAZY single-row aggregates (a driver
    // .count() here would run jobs at query-build time)
    val cntA = ra.agg(count(lit(1)).as("n_distinct_a"))
    val cntB = rb.agg(count(lit(1)).as("n_distinct_b"))
    ranked.agg(
        count(lit(1)).as("n"),
        sum(expr("cast(_x as decimal(38,0))")).as("_sx"),
        sum(expr("cast(_y as decimal(38,0))")).as("_sy"),
        sum(expr("cast(_x as decimal(38,0)) * _y")).as("_sxy"),
        sum(expr("cast(_x as decimal(38,0)) * _x")).as("_sxx"),
        sum(expr("cast(_y as decimal(38,0)) * _y")).as("_syy"))
      .withColumn("_num", expr("n * _sxy - _sx * _sy"))
      .withColumn("_dx", expr("n * _sxx - _sx * _sx"))
      .withColumn("_dy", expr("n * _syy - _sy * _sy"))
      .withColumn("rho2_e8", expr(
        "if(_dx > 0 and _dy > 0, " +
          "cast(if(_num >= 0, 1L, -1L) * " +
          "((abs(_num) * 10000 div _dx) * (abs(_num) * 10000 div _dy)) " +
          "as bigint), null)"))
      .withColumn("rho_bp", expr(
        "if(rho2_e8 is null, null, " +
          "if(rho2_e8 >= 0, 1L, -1L) * " +
          "cast(floor(sqrt(cast(abs(rho2_e8) as double))) as bigint))"))
      .crossJoin(cntA).crossJoin(cntB) // single-row aggregates
      .select(col("n"), col("n_distinct_a"), col("n_distinct_b"),
        col("rho2_e8"), col("rho_bp"))
  }

  /** Reliability (calibration) table for a basis-point score against a
    * boolean outcome — the companion readout to [[aucBp]]: AUC says the
    * ORDER is right, calibration says the VALUES mean what they claim
    * (a doc scored 7000 bp should be positive ~70% of the time). Bins
    * are equal-width in score space; per bin the observed positive rate
    * sits next to the mean claimed score, and `gap_bp` is the signed
    * miscalibration (Σ n·|gap| / N over bins = ECE, left to the caller
    * so the table stays composable). One map-side-combinable
    * aggregation over a bins-sized output; all ratios exact integer.
    *
    * Out: per bin `(bin, n, n_pos, mean_score_bp, pos_rate_bp,
    * gap_bp)`.
    */
  def calibrationBins(scored: DataFrame, label: Column,
      scoreBpCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 10000 % bins == 0,
      s"bins must divide the bp domain: $bins")
    val wdt = 10000 / bins
    scored
      .select(col(scoreBpCol).as("_s"),
        when(label, 1L).otherwise(0L).as("_y"))
      .withColumn("bin",
        expr(s"least(greatest(_s div $wdt, 0L), ${bins - 1}L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_s")).as("_ss"))
      .withColumn("mean_score_bp", expr("_ss div n"))
      .withColumn("pos_rate_bp", expr("n_pos * 10000 div n"))
      .withColumn("gap_bp", expr("pos_rate_bp - mean_score_bp"))
      .select("bin", "n", "n_pos", "mean_score_bp", "pos_rate_bp", "gap_bp")
  }

  /** Poisson(1) cumulative thresholds scaled to the 2³² draw domain
    * (floor(P(W ≤ k)·2³²), k = 0..7) — the inverse-CDF table for the
    * seeded bootstrap weights below. Truncating at 7 loses
    * P(W > 7) ≈ 1.02·10⁻⁵ of weight mass, deterministically in both
    * engines.
    */
  val PoissonThresholds2_32: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Seeded Poisson-bootstrap confidence interval for a per-group mean —
    * the error bar every corpus-stats dashboard should carry but rarely
    * does (a mean quality shift of 2 points means nothing without one).
    * The Poisson bootstrap (Chamandy et al. 2012, Google's
    * "Estimating Uncertainty for Massive Data Streams") replaces
    * with-replacement resampling — which needs the row count up front
    * and a global shuffle per replicate — with an independent
    * Poisson(1) weight PER (row, replicate): every replicate mean
    * becomes one weighted aggregate, all `b` replicates ride ONE pass
    * over rows×b, and shards/executors never coordinate.
    *
    * Determinism: the weight is the inverse CDF of md5(seed:rep:id) at
    * the fixed [[PoissonThresholds2_32]] table, replicate means are
    * exact integer ratios in micro-units, and the CI bounds are ORDER
    * STATISTICS of the b means (ranks ⌈loBp·b/10⁴⌉ / ⌈hiBp·b/10⁴⌉,
    * ties broken by replicate id) — no interpolation, no RNG state, so
    * a second engine replays the exact interval. Replicates whose
    * total weight lands at 0 (P ≈ e⁻ⁿ, gone for any real group) are
    * dropped and reported via `b_effective`.
    *
    * Shape: one rows×b projection feeding a (group, replicate)
    * aggregate with map-side partials; the order-statistic window
    * partitions by group over b-bounded frames. Corpus cost is b× one
    * scan — for 100 TB inputs bootstrap a deterministic md5 row-sample
    * first (the estimator composes; Chamandy et al. do exactly this).
    *
    * Out: one row per group `(group, n_rows, mean_micro, ci_lo_micro,
    * ci_hi_micro, b_effective)`.
    */
  def bootstrapCI(rows: DataFrame, valueCol: String, groupCol: String,
      idCol: String, b: Int = 100, seed: String = "boot1",
      loBp: Int = 250, hiBp: Int = 9750): DataFrame = {
    require(b >= 2 && loBp >= 0 && hiBp <= 10000 && loBp < hiBp)
    val thr = PoissonThresholds2_32
    val u = conv(substring(md5(concat(lit(s"$seed:"), col("_rep"),
      lit(":"), col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    // fold REVERSED so the smallest threshold tests outermost —
    // CASE u < t0 THEN 0 WHEN u < t1 THEN 1 … ELSE 8
    val w = thr.indices.reverse.foldLeft(lit(thr.length.toLong)) { (acc, k) =>
      when(u < thr(k), k.toLong).otherwise(acc)
    }
    val reps = rows
      .withColumn("_rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("_w", w)
      .groupBy(col(groupCol), col("_rep"))
      .agg(sum(expr(s"_w * $valueCol")).as("_ws"),
        sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0L)
      .withColumn("_mean", expr("_ws * 1000000L div _wn"))
    val ranked = reps.withColumn("_r", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
        .orderBy(col("_mean"), col("_rep")))) // b-bounded frames
    val stats = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("b_effective"))
    val cis = ranked.join(stats, Seq(groupCol))
      .withColumn("_klo", expr(s"greatest(($loBp * b_effective + 9999) div 10000, 1L)"))
      .withColumn("_khi", expr(s"greatest(($hiBp * b_effective + 9999) div 10000, 1L)"))
      .groupBy(col(groupCol), col("b_effective"))
      .agg(max(when(col("_r") === col("_klo"), col("_mean"))).as("ci_lo_micro"),
        max(when(col("_r") === col("_khi"), col("_mean"))).as("ci_hi_micro"))
    rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"sum($valueCol) * 1000000L div count(1)").as("mean_micro"))
      .join(cis, Seq(groupCol))
      .select(col(groupCol), col("n_rows"), col("mean_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"), col("b_effective"))
  }

  /** Robust per-group location: the plain mean next to its TRIMMED and
    * WINSORIZED forms (Tukey's classics) — the quality-dashboard guard
    * against a heavy tail dragging a source's mean (one 10⁶-char spam
    * doc shifts a mean where trimmed/winsorized barely move; a large
    * trimmed-vs-mean gap IS the tail alarm). `trimBp` of each side is
    * cut (trimmed) or clamped to the cut boundary values (winsorized),
    * with k = n·trimBp div 10⁴ rows per side.
    *
    * Exact-integer decomposition over the score VALUE domain (the
    * curriculum/aucBp precedent — never a corpus sort): per (group,
    * score) cell, its overlap with the kept rank window [k+1, n−k] is
    * `min(cum, n−k) − max(cum_before, k)` clamped at 0; boundary values
    * lo/hi are the scores whose cumulative count first reaches k+1 /
    * n−k. One bounded cumulative window per group over the cell table,
    * then one aggregate. Degenerate groups (n − 2k ≤ 0) report NULL
    * robust means.
    *
    * Out per group: (groupCol, n, mean_bp, trimmed_mean_bp,
    * winsor_mean_bp, lo_bp, hi_bp).
    */
  def robustMean(scored: DataFrame, groupCol: String,
      scoreBpCol: String, trimBp: Int = 500): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000, s"trimBp out of range: $trimBp")
    import org.apache.spark.sql.expressions.Window
    val cells = scored
      .select(col(groupCol).as("_g"), col(scoreBpCol).as("_s"))
      .groupBy("_g", "_s")
      .agg(count(lit(1)).as("_c"), sum(col("_s")).as("_ss"))
    val w = Window.partitionBy("_g").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy("_g")))
      .withColumn("_k", expr(s"_n * $trimBp div 10000"))
      .withColumn("_keep",
        expr("greatest(0L, least(_cum, _n - _k) " +
          "- greatest(_cum - _c, _k))"))
    cum.groupBy(col("_g").as(groupCol))
      .agg(max(col("_n")).as("n"), max(col("_k")).as("_kk"),
        sum(col("_ss")).as("_tot"),
        sum(expr("_keep * _s")).as("_kept"),
        min(when(col("_cum") >= col("_k") + 1, col("_s"))).as("lo_bp"),
        min(when(col("_cum") >= col("_n") - col("_k"), col("_s")))
          .as("hi_bp"))
      .withColumn("mean_bp", expr("_tot div n"))
      .withColumn("trimmed_mean_bp",
        expr("if(n - 2 * _kk > 0, _kept div (n - 2 * _kk), null)"))
      .withColumn("winsor_mean_bp",
        expr("if(n > 0, (_kept + _kk * (lo_bp + hi_bp)) div n, null)"))
      .select(groupCol, "n", "mean_bp", "trimmed_mean_bp",
        "winsor_mean_bp", "lo_bp", "hi_bp")
  }

  /** Exact Gini coefficient per group in bp — the inequality readout for
    * "how concentrated is this corpus/revenue/token mass across its
    * contributors" (the companion to the HHI query: HHI squares SHARES,
    * Gini ranks the Lorenz curve). Closed form on the sorted values,
    *
    *   G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) div (n·Σx)
    *
    * with Σᵢ i·x₍ᵢ₎ decomposed exactly over the VALUE domain: a cell of
    * c copies of v occupying ranks (cum_before, cum] contributes
    * v·(c·cum_before + c·(c+1)/2). Products run in DECIMAL(38,0)
    * (HUGEINT oracle — the aucBp precedent) so n·Σx never wraps;
    * outputs are BIGINT bp. Non-negative values assumed (Lorenz form);
    * all-zero or empty groups → NULL.
    *
    * Out per group: (groupCol, n, total, gini_bp).
    */
  def gini(values: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = values
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("_cb", coalesce(sum(col("_c")).over(w), lit(0L)))
      .groupBy(col("_g").as(groupCol))
      .agg(sum(col("_c")).as("n"),
        sum(expr("cast(_v as decimal(38,0)) * _c")).as("_sx"),
        sum(expr("cast(_v as decimal(38,0)) * " +
          "(cast(_c as decimal(38,0)) * _cb + " +
          "cast(_c as decimal(38,0)) * (_c + 1) div 2)")).as("_sr"))
      .withColumn("total", expr("cast(_sx as bigint)"))
      .withColumn("gini_bp",
        expr("if(_sx > 0, cast((2 * _sr - (n + 1) * _sx) * 10000 div " +
          "(cast(n as decimal(38,0)) * _sx) as bigint), null)"))
      .select(groupCol, "n", "total", "gini_bp")
  }
}
