package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) via phonetic blocking — the
  * classic dedup shape for NAME-like keys, where MinHash/LSH shingles
  * are the wrong granularity: "jonsen"/"jonson" share almost no
  * 5-gram shingles but one phonetic block. Candidates come from an
  * equi-join on a Soundex-class key (first letter + the first three
  * collapsed consonant-class digits), verification is exact
  * Levenshtein on the candidate pairs only — the third candidate-
  * generation family in this library next to banded LSH (minhash/
  * simhash/phash) and inverted-index rarity (ngram/containment).
  *
  * Scale shape: the key is a pure codegen projection (translate + six
  * run-collapse regexes — the backreference-free Java∩RE2 subset);
  * candidates are one equi-shuffle on the key; the edit-distance
  * kernel runs on candidates only, never corpus². Phonetic blocks are
  * the op's skew mode (common names make hot keys) — at corpus scale
  * the same bucket-cap/salting guards the LSH family uses apply, and
  * composite keys (phonetic × birth-year-style second attribute)
  * shrink blocks multiplicatively.
  */
object EntityResolution {

  /** Soundex-class consonant mapping: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5
    * R→6; vowels, H, W, Y and spaces drop (translate removes source
    * chars with no target).
    */
  private val PhoneticSrc = "BFPVCGJKQSXZDTLMNRAEIOUYHW "
  private val PhoneticDst = "111122222222334556"

  /** Blocking key: first letter + first 3 run-collapsed class digits of
    * the rest, zero-padded — a simplified (whole-tail, cross-vowel
    * collapsing) Soundex-class key. Deterministic, engine-replayable:
    * upper/translate/rpad plus six single-digit run collapses.
    */
  def phoneticKey(name: Column): Column = {
    val u = upper(name)
    val coded = regexp_replace(
      translate(u.substr(lit(2), length(u)), PhoneticSrc, PhoneticDst),
      "[^1-6]", "")  // translate keeps unmapped chars (punct, digits)
    val collapsed = (1 to 6).foldLeft(coded) { (c, d) =>
      regexp_replace(c, s"$d$d+", s"$d")
    }
    concat(u.substr(lit(1), lit(1)), rpad(substring(collapsed, 1, 3), 3, "0"))
  }

  /** All record pairs (id1 < id2) sharing a phonetic block whose names
    * are within `maxDist` edits: (pkey, id1, id2, name1, name2, dist).
    */
  def blockedMatches(
      recs: DataFrame, idCol: String, nameCol: String, maxDist: Int = 2
  ): DataFrame = {
    val keyed = recs.select(col(idCol), col(nameCol),
      phoneticKey(col(nameCol)).as("pkey"))
    val a = keyed.select(col("pkey"), col(idCol).as("id1"),
      col(nameCol).as("name1"))
    val b = keyed.select(col("pkey"), col(idCol).as("id2"),
      col(nameCol).as("name2"))
    a.join(b, Seq("pkey"))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995 — the
    * merge/purge method): records rank globally by (name, id); every
    * pair within `w` rank positions is a candidate; exact Levenshtein
    * verifies. The complementary generator to [[blockedMatches]]:
    * blocking misses corruptions that change the phonetic CLASS, the
    * sorted window misses corruptions in the first characters — real
    * merge/purge runs multiple passes with different keys; both passes
    * here share the verify kernel and output shape.
    *
    * The global rank is built WITHOUT a global sort: fixed first-char
    * boundaries partition the key domain (a range partition with known
    * split points — no sampled partitioner, so the rank is
    * deterministic and engine-replayable), rank = per-prefix
    * row_number + prefix offset, offsets from one prefix-sized
    * aggregation (alphabet-bounded) cumulated on the driver. Candidate
    * pairs come from a NEIGHBOR-BUCKET equi-join (bucket = rank div w;
    * one side explodes to {b, b−1}), which finds each |Δrank| < w pair
    * exactly once — work is corpus × 2 join rows, never corpus².
    */
  def sortedNeighborhood(
      recs: DataFrame, idCol: String, nameCol: String,
      w: Int = 6, maxDist: Int = 2
  ): DataFrame = {
    require(w >= 2, s"window too small: w=$w")
    val spark = recs.sparkSession
    import spark.implicits._
    val keyed = recs.select(col(idCol).as("rid"), col(nameCol).as("nm"))
      .withColumn("pfx", substring(col("nm"), 1, 1))
    val offsets = {
      val counts = keyed.groupBy("pfx").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      counts.map { case (p, n) => val o = acc; acc += n; (p, o) }
    }
    val offDf = broadcast(offsets.toSeq.toDF("pfx", "off"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("pfx").orderBy("nm", "rid")
    val ranked = graft.util.AutoUnpersist.persistScoped(
      keyed.join(offDf, "pfx")
        .withColumn("rk", row_number().over(wnd).cast("long") + col("off")))
    val l = ranked.select(col("rid").as("id1"), col("nm").as("name1"),
        col("rk").as("r1"))
      .withColumn("bkt", expr(s"r1 div $w"))
    val r = ranked.select(col("rid").as("id2"), col("nm").as("name2"),
        col("rk").as("r2"))
      .withColumn("bkt", explode(array(expr(s"r2 div $w"),
        expr(s"r2 div $w - 1"))))
    l.join(r, "bkt")
      .filter(col("r2") > col("r1") && col("r2") - col("r1") <= w - 1)
      .withColumn("gap", col("r2") - col("r1"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "name1", "name2", "gap", "dist")
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    * Sunter 1969, JASA) over blocked candidate pairs: each compared
    * field contributes a log-odds weight — agreement earns log2(m/u),
    * disagreement log2((1−m)/(1−u)) — where u, the chance-agreement
    * probability, comes from the field's OWN value distribution
    * (Winkler's frequency-based estimate u = Σ_v c_v²/N²) and m, the
    * agreement rate among true matches, is the per-call `mBp`/10⁴
    * (the classic fixed choice absent labeled pairs). Rare-value
    * fields (names) thus earn large agreement weights and a common
    * language column a small one — the thing a plain agree-count
    * treats identically. Verdicts split at the two Fellegi–Sunter
    * thresholds: score ≥ `upperFp` → match, ≥ `lowerFp` → possible
    * (the clerical-review band), below → nonmatch.
    *
    * Exact replay: field stats are BIGINT (Σc², N²); the four log
    * operands per field go through the fixed-point log2 driver twin
    * [[TextAnalysis.pseudoLog2Long]] (parity-pinned with the engine
    * recursion), weights become driver-constant literals, and pair
    * scoring is a pure codegen projection — a second engine replaying
    * the same stats reproduces every score_fp bit-for-bit. Weights use
    * the DECOMPOSED log form pl2(m)+2·pl2(N)−pl2(10⁴)−pl2(Σc²) so no
    * operand ever exceeds the pseudo-log2 x<2⁴³ headroom. A field
    * with a single distinct value cannot disagree; its disagree weight
    * is the −2⁸ bit sentinel (never fires on real pairs).
    *
    * Scale shape: ONE value-count aggregate for ALL fields (each field's
    * values tagged and unioned via a per-row explode — r9: this was one
    * aggregate job PER field plus a count() job, each recomputing the
    * caller's derived frame; now a single job over |fields|·N tagged
    * rows returns every Σc² AND N together, and the input is cached for
    * the stats pass + both join sides); candidates are one equi-shuffle
    * on the block key (hot-block caps/salting as in [[blockedMatches]]);
    * scoring adds no join. Bound: Σc² ≤ N² < 2⁴³ → N ≤ 2.9·10⁶ records
    * per linkage domain; past that, estimate u on an md5-keyed record
    * sample (the same escape the kappa op documents). Within-field
    * value identity is preserved by the string tagging: strings ride
    * verbatim and integral types render injectively, so each field's
    * c_v multiset — hence u — is EXACTLY the per-field groupBy's.
    *
    * Out: (id1, id2, n_agree, score_fp, verdict).
    */
  def fellegiSunter(
      recs0: DataFrame, idCol: String, blockCol: String,
      fields: Seq[String], mBp: Long = 9500L,
      upperFp: Long = 3L << 16, lowerFp: Long = 0L
  ): DataFrame = {
    require(fields.nonEmpty && mBp > 0 && mBp < 10000)
    val pl2 = TextAnalysis.pseudoLog2Long(_: Long)
    // bounded by the N ≤ 2.9e6 require below — safe to cache; spares
    // the derived input frame 4 recomputations (stats job + count job
    // under the old shape, and the two self-join sides). Deferred
    // registration: the stats collect below populates the cache, and
    // only the returned plan's first consumer releases it.
    val recs = graft.util.AutoUnpersist.persistDeferred(recs0)
    val stats = recs
      .select(explode(array(fields.map(f =>
        struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*))
        .as("_fv"))
      .groupBy(col("_fv.f").as("_f"), col("_fv.v").as("_v"))
      .agg(count(lit(1)).as("_c"))
      .groupBy("_f")
      .agg(sum(expr("_c * _c")).as("_s2"), sum(col("_c")).as("_n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n = stats.valuesIterator.map(_._2).nextOption().getOrElse(0L)
    require(n > 0 && n <= 2900000L,
      s"frequency-based u needs N^2 < 2^43: N=$n — sample first")
    val uDen = n * n
    val lBase = pl2(mBp) - pl2(10000L) + 2 * pl2(n)
    val lBaseD = pl2(10000L - mBp) - pl2(10000L) + 2 * pl2(n)
    val weights = fields.map { f =>
      val uNum = stats(f)._1
      val wa = lBase - pl2(uNum)
      val wd =
        if (uNum == uDen) -(1L << 24)
        else lBaseD - pl2(uDen - uNum)
      f -> ((wa, wd))
    }.toMap
    val a = recs.select(col(blockCol).as("_bk") +: col(idCol).as("id1") +:
      fields.map(f => col(f).as(s"_a_$f")): _*)
    val b = recs.select(col(blockCol).as("_bk") +: col(idCol).as("id2") +:
      fields.map(f => col(f).as(s"_b_$f")): _*)
    val agree = fields.map(f => (f, col(s"_a_$f") === col(s"_b_$f")))
    val out = a.join(b, Seq("_bk"))
      .filter(col("id1") < col("id2"))
      .withColumn("n_agree",
        agree.map { case (_, eq) => when(eq, 1L).otherwise(0L) }
          .reduce(_ + _))
      .withColumn("score_fp",
        agree.map { case (f, eq) =>
          val (wa, wd) = weights(f)
          when(eq, lit(wa)).otherwise(lit(wd))
        }.reduce(_ + _))
      .withColumn("verdict",
        when(col("score_fp") >= upperFp, lit("match"))
          .when(col("score_fp") >= lowerFp, lit("possible"))
          .otherwise(lit("nonmatch")))
      .select("id1", "id2", "n_agree", "score_fp", "verdict")
    graft.util.AutoUnpersist.register(recs)
    out
  }
}
