package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits for data release — the checks a corpus/telemetry
  * export runs AFTER PII scrubbing (`TextClean`), which removes
  * direct identifiers but not linkage risk: quasi-identifier (QI)
  * combinations that map to few subjects re-identify them by join with
  * any outside dataset (Sweeney's k-anonymity; Machanavajjhala's
  * l-diversity for the sensitive-attribute variant).
  *
  * Scale shape: one groupBy on the QI columns with map-side partials;
  * `count_distinct` over subjects/sensitive values is the only
  * expensive aggregate and Spark plans it as the standard two-phase
  * partial-distinct expand. Output is QI-domain-sized (the product of
  * generalized attribute cardinalities — small by construction: a QI
  * scheme with corpus-sized output is already failing the audit).
  * No joins, no windows; corpus growth only widens the first pass.
  */
object Privacy {

  /** Per distinct QI combination: row volume, distinct subjects,
    * distinct sensitive values, and the verdicts — `at_risk` when fewer
    * than `k` subjects share the combination (k-anonymity), `low_div`
    * when fewer than `l` sensitive values do (l-diversity: a uniform
    * sensitive value leaks it even when k holds).
    */
  def kAnonymity(
      df: DataFrame, qiCols: Seq[String], subjectCol: String,
      sensitiveCol: String, k: Int = 5, l: Int = 2
  ): DataFrame = {
    require(qiCols.nonEmpty && k >= 2 && l >= 1)
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(subjectCol)).as("n_subjects"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_subjects") < k)
      .withColumn("low_div", col("n_sensitive") < l)
  }

  /** Right-to-be-forgotten purge over a stored corpus AND its derived
    * signature index, with CONTENT expansion: a deletion request names
    * doc ids, but the same content may live under other ids (mirrors,
    * re-crawls, exact dups) — erasure that stops at the requested id
    * leaves the content in the corpus. The forget set therefore
    * expands through the content fingerprint (md5 of text): every doc
    * sharing a requested doc's fingerprint is purged, from the corpus
    * and the index in the same anti-join pass, so the two stored
    * artifacts never diverge.
    *
    * Returns (purgedCorpus, purgedIndex, audit) — the audit is ONE row
    * a compliance log stores: before/after volumes for both artifacts,
    * request and expansion counts, and two invariants that must read
    * zero: residual docs carrying forgotten content, and index entries
    * for ids no longer in the corpus.
    *
    * Scale shape: fingerprint expansion is two equi-joins on the
    * (requests-sized, broadcastable) fingerprint set; the purges are
    * LeftAnti joins — shuffle on id, no full rewrite until the sink
    * chooses to compact. At 100 TB the anti-join output IS the
    * retained corpus rewrite, which is what GDPR erasure costs on
    * immutable storage; partition pruning on an id-range layout bounds
    * the rewrite to affected files.
    */
  /** ε-differentially-private noisy release counts — the mechanism a
    * telemetry/corpus-stats export applies so that published per-group
    * counts don't leak any individual row: each count gets two-sided
    * geometric noise Z = G₁ − G₂, G ~ Geometric(1−α) (the discrete
    * Laplace; Ghosh–Roughgarden–Sundararajan 2012 show it's the
    * UNIVERSALLY optimal ε-DP mechanism for counts), with
    * α = `alphaBp`/10⁴ = e^(−ε) — so alphaBp 9000 ≈ ε 0.105/release,
    * alphaBp 3679 ≈ ε 1.
    *
    * The noise is SEEDED, not sampled: U = (md5(seed:group:i)+1)/2³²
    * through the inverse CDF G = ⌊log U / log α⌋, evaluated entirely in
    * the engine's fixed-point log2 ([[TextAnalysis.withPseudoLog2]] for
    * the column side, its driver twin for the α denominator) — so a
    * rerun or a second engine reproduces the released table
    * bit-for-bit, and there is no RNG state to coordinate across
    * executors. DP accounting treats the seed as secret (standard for
    * PRG-based DP); publish the counts, never the seed. Negative
    * noisy counts clamp to 0 — post-processing, DP-safe.
    *
    * Shape: one map-side-combinable group count, two md5 draws and two
    * chained log projections over the GROUP-domain table (not the
    * corpus), no joins. Out: `(group, noisy_count)` — deliberately no
    * true count or noise column; a release table must not carry them.
    */
  def dpNoisyCounts(rows: DataFrame, groupCol: String, alphaBp: Long,
      seed: String = "dp1"): DataFrame = {
    require(alphaBp >= 1 && alphaBp < 10000, s"alphaBp out of (0,1): $alphaBp")
    val den = TextAnalysis.pseudoLog2Long(10000L) -
      TextAnalysis.pseudoLog2Long(alphaBp)
    def u(i: Int) =
      conv(substring(md5(concat(lit(s"$seed:"), col(groupCol).cast("string"),
        lit(s":$i"))), 1, 8), 16, 10).cast("long") + 1
    val counts = rows.groupBy(col(groupCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_u1", u(1)).withColumn("_u2", u(2))
    val logged = TextAnalysis.withPseudoLog2(
      TextAnalysis.withPseudoLog2(counts, "_u1", "_l1"), "_u2", "_l2")
    logged
      .withColumn("_g1", expr(s"(2097152 - _l1) div $den"))
      .withColumn("_g2", expr(s"(2097152 - _l2) div $den"))
      .select(col(groupCol),
        greatest(expr("_c + _g1 - _g2"), lit(0L)).as("noisy_count"))
  }

  def forgetByContent(
      corpus: DataFrame, index: DataFrame, requests: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"
  ): (DataFrame, DataFrame, DataFrame) = {
    val reqs = requests.select(col(idCol)).distinct()
    val fps = graft.util.AutoUnpersist.persistScoped(
      corpus.join(reqs, idCol)
        .select(md5(col(textCol)).as("_fp")).distinct())
    val expanded = graft.util.AutoUnpersist.persistScoped(
      corpus.select(col(idCol), md5(col(textCol)).as("_fp"))
        .join(fps, "_fp")
        .select(idCol).distinct())
    val purgedCorpus = corpus.join(expanded, Seq(idCol), "left_anti")
    val purgedIndex = index.join(expanded, Seq(idCol), "left_anti")
    def one(df: DataFrame, name: String) =
      broadcast(df.agg(count(lit(1)).as(name)))
    val residual = purgedCorpus
      .select(md5(col(textCol)).as("_fp")).join(fps, "_fp")
    val orphans = purgedIndex.select(col(idCol))
      .join(purgedCorpus.select(col(idCol)), Seq(idCol), "left_anti")
    val audit = one(corpus, "n_corpus_before")
      .crossJoin(one(reqs, "n_requests"))
      .crossJoin(one(expanded, "n_forgotten"))
      .crossJoin(one(purgedCorpus, "n_corpus_after"))
      .crossJoin(one(index, "n_index_before"))
      .crossJoin(one(purgedIndex, "n_index_after"))
      .crossJoin(one(residual, "n_residual_content"))
      .crossJoin(one(orphans, "n_index_orphans"))
    (purgedCorpus, purgedIndex, audit)
  }
}
