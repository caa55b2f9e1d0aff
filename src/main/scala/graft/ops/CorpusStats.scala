package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-corpus statistical profiles for training-data curation: the
  * readouts that describe a corpus as a POPULATION (vocabulary growth,
  * term dispersion, n-gram novelty against a reference) rather than
  * score individual documents. All three collapse corpus-scale input to
  * bounded-domain output (buckets, top-k terms, deciles) with exact
  * integer arithmetic, so every number replays bit-for-bit in any
  * engine.
  */
object CorpusStats {

  /** Vocabulary-growth (Heaps'-law) curve: cumulative distinct-token
    * count as the corpus grows doc by doc, the standard "is this corpus
    * still contributing new language" readout when deciding whether
    * another crawl snapshot is worth ingesting (sub-linear growth that
    * flattens early = the corpus is saturating).
    *
    * The prefix order is the id order, quantized to `nBuckets` equal id
    * ranges (any fixed order gives a valid growth curve; ids make it
    * deterministic and engine-replayable). The cumulative distinct
    * DECOMPOSES — a token counts as new exactly once, in the bucket of
    * its FIRST occurrence:
    *
    *   vocab_cum(b) = |{t : min bucket containing t ≤ b}|
    *
    * so the plan is one corpus-shaped (token → min bucket) aggregation
    * plus bucket-domain windows — never a per-prefix distinct rescan
    * (which would be nBuckets corpus passes) and never a corpus-sized
    * window. The ratio column `ttr_bp = 10⁴·vocab_cum div tokens_cum`
    * is the cumulative type-token ratio in basis points.
    *
    * Buckets with no docs still appear (densified from a sequence spine)
    * so the curve always has exactly `nBuckets` rows.
    *
    * Out: `(bucket, docs_cum, tokens_cum, vocab_cum, ttr_bp)`, one row
    * per bucket 0..nBuckets−1; ttr_bp NULL while tokens_cum = 0.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, s"need at least one bucket: $nBuckets")
    val toks = docs.select(col(idCol).cast("long").as("_id"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    // id range → bucket; max from a 1-row aggregate (the allowlisted
    // 1-row-broadcast pattern, never corpus-sided)
    val maxId = toks.agg(max(col("_id")).as("_max"))
    // clamp below 0: a NEGATIVE id would otherwise bucket below the
    // 0..nBuckets−1 spine and its doc/token/vocab mass silently drop
    // off the spine join (curve undercounts). `_id * nBuckets` also
    // overflows for ids near Long.MaxValue/nBuckets — callers with
    // synthetic 63-bit ids must pre-scale (documented limit).
    val bucketed = toks.crossJoin(maxId)
      .withColumn("_b", greatest(lit(0L), least(lit(nBuckets - 1),
        expr(s"_id * $nBuckets div (_max + 1)"))).cast("long"))
    // per-bucket doc/token mass
    val mass = bucketed.groupBy("_b")
      .agg(count(lit(1)).as("_docs"), sum(size(col("_t"))).as("_toks"))
    // each token's FIRST bucket (the one corpus-shaped aggregation),
    // then new-vocab count per bucket
    val firsts = bucketed
      .select(col("_b"), explode(col("_t")).as("_w"))
      .groupBy("_w").agg(min(col("_b")).as("_fb"))
      .groupBy(col("_fb").as("_b")).agg(count(lit(1)).as("_new"))
    // densified bucket spine + cumulative windows over ≤ nBuckets rows
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    maxId.select(explode(sequence(lit(0L),
        lit(nBuckets - 1L))).as("bucket"))
      .join(mass, col("bucket") === col("_b"), "left").drop("_b")
      .join(firsts, col("bucket") === col("_b"), "left").drop("_b")
      .withColumn("docs_cum", sum(coalesce(col("_docs"), lit(0L))).over(w))
      .withColumn("tokens_cum", sum(coalesce(col("_toks"), lit(0L))).over(w))
      .withColumn("vocab_cum", sum(coalesce(col("_new"), lit(0L))).over(w))
      .withColumn("ttr_bp",
        expr("if(tokens_cum > 0, vocab_cum * 10000 div tokens_cum, null)"))
      .select("bucket", "docs_cum", "tokens_cum", "vocab_cum", "ttr_bp")
  }

  /** Term burstiness — Gries' deviation of proportions (DP) for the
    * top-k corpus terms: is a term spread evenly across corpus parts
    * (function words → DP near 0) or concentrated in a few (topical /
    * template / spam terms → DP near 1)? The dispersion signal that
    * frequency alone hides: a term pasted a million times into one
    * shard and a term used once per document can have the SAME count.
    *
    *   DP(t) = ½ Σ_i |cnt(t,i)/cnt(t) − tok(i)/T|
    *
    * over parts i = id mod nParts. Exact integers: the common-
    * denominator form Σ|cnt_ti·T − cnt_t·tok_i| runs in DECIMAL(38,0)
    * (cnt·T wraps BIGINT past ~10⁹ corpus tokens — the aucBp
    * precedent), and parts where the term is ABSENT contribute
    * algebraically (cnt_t · (T − Σ_present tok_i)) so sparse
    * (token, part) counts never densify:
    *
    *   dp_bp = 10⁴ · (Σ_present |…| + cnt_t·(T − Σ_present tok_i))
    *           div (2·cnt_t·T)
    *
    * Shape: one corpus-shaped (token, part) count, a k-row top-k, and
    * nParts-row / 1-row broadcast joins — per-term state is its own
    * present-part list, ≤ nParts rows. Tie-break for the top-k cut:
    * (count desc, token asc), exact.
    *
    * Out: `(token, cnt, dp_bp)`, k rows, ordered by (cnt desc, token).
    */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
      nParts: Int = 8, topK: Int = 50): DataFrame = {
    require(nParts >= 2 && topK >= 1, s"nParts=$nParts topK=$topK")
    val tp = docs
      .select(pmod(col(idCol).cast("long"), lit(nParts)).as("_p"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token", "_p").agg(count(lit(1)).as("_c"))
    val partTotals = tp.groupBy("_p").agg(sum(col("_c")).as("_tok"))
    val grand = partTotals.agg(sum(col("_tok")).as("_T"))
    val top = tp.groupBy("token").agg(sum(col("_c")).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topK)
    tp.join(broadcast(top), "token")
      .join(broadcast(partTotals), "_p")
      .crossJoin(grand)
      .groupBy(col("token"), col("cnt"), col("_T"))
      .agg(
        sum(expr("abs(cast(_c as decimal(38,0)) * _T " +
          "- cast(cnt as decimal(38,0)) * _tok)")).as("_dev"),
        sum(col("_tok")).as("_present"))
      .withColumn("dp_bp",
        expr("cast((_dev + cast(cnt as decimal(38,0)) * (_T - _present)) " +
          "* 10000 div (2 * cast(cnt as decimal(38,0)) * _T) as bigint)"))
      .select(col("token"), col("cnt"), col("dp_bp"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** N-gram novelty of a test corpus against a reference corpus — the
    * memorization/novelty readout (what fraction of a generated or
    * newly-crawled document's n-grams are NOT already in the corpus you
    * trained on). Per test doc, over its DISTINCT n-grams:
    *
    *   novelty_bp = 10⁴ · (grams − hits) div grams
    *
    * then collapsed to a bounded histogram by novelty decile (bucket =
    * novelty_bp div 1000, 0..10) so the output never scales with the
    * corpus. Docs with fewer than n tokens have no grams and are
    * excluded (documented; count them with a length gate upstream).
    *
    * Shape: both sides reduce to distinct (doc, gram) / (gram) sets,
    * one gram-keyed LEFT equi-join (shuffle join — the reference side
    * is corpus-shaped, never broadcast), one doc-keyed aggregation,
    * one 11-row histogram.
    *
    * Out: `(decile, docs, grams, novel_grams)` ordered by decile.
    */
  def ngramNovelty(test: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n-gram order must be positive: $n")
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("_id"),
        TextAnalysis.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= n)
      .select(col("_id"), explode(transform(
        sequence(lit(0), size(col("_t")) - n),
        i => concat_ws(" ", (1 to n).map(j =>
          element_at(col("_t"), i + j)): _*))).as("gram"))
      .distinct()
    val refGrams = grams(ref).select("gram").distinct()
      .withColumn("_hit", lit(1L))
    grams(test)
      .join(refGrams, Seq("gram"), "left")
      .groupBy("_id")
      .agg(count(lit(1)).as("_g"), sum(coalesce(col("_hit"), lit(0L))).as("_h"))
      .withColumn("_nov", expr("(_g - _h) * 10000 div _g"))
      .groupBy(expr("_nov div 1000").as("decile"))
      .agg(count(lit(1)).as("docs"), sum(col("_g")).as("grams"),
        sum(expr("_g - _h")).as("novel_grams"))
      .orderBy("decile")
  }
}
