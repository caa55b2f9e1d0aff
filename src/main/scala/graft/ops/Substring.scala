package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the token-level core of
  * suffix-array corpus dedup (Lee et al. 2021, "Deduplicating Training
  * Data Makes Language Models Better"): find every maximal token span
  * that also occurs elsewhere in the corpus at least `minRep` times, so
  * a pipeline can mask or cut verbatim boilerplate (licenses, headers,
  * templated text) that document-level near-dedup leaves behind.
  *
  * A literal suffix array doesn't distribute; the equivalent bounded
  * formulation does: every length-`n` token window is a positioned
  * shingle, corpus-frequency-counted in one aggregation, and occurrences
  * of frequent windows merge into maximal spans per document with one
  * window function (gaps-and-islands: a new span starts where a window's
  * start position clears the running max end of everything before it).
  * All integer arithmetic — any engine replays it exactly.
  *
  * Scale shape: the window stream is corpus-linear (one row per token
  * position), aggregated with map-side partials into a vocabulary-of-
  * windows table; only windows seen ≥ `minRep` times join back (rare by
  * construction at high `minRep` — the frequent-window table is the
  * boilerplate itself). The per-doc island pass partitions by document.
  * No step is ever corpus × corpus.
  */
object Substring {

  /** Maximal repeated spans: (doc_id, span_start, span_end, n_windows,
    * max_rep) — token-index [start, end) of each maximal merged run of
    * length-`n` windows whose corpus occurrence count is ≥ `minRep`,
    * the number of such windows merged into the span, and the highest
    * occurrence count among them.
    */
  def repeatedSpans(
      docs: DataFrame, n: Int = 8, minRep: Int = 3
  ): DataFrame = {
    require(n >= 2 && minRep >= 2, s"degenerate params: n=$n minRep=$minRep")
    val t = col("_toks")
    // the positioned window stream feeds two branches (frequency agg +
    // join-back) — scoped-persist so the corpus explode runs once
    val windows = graft.util.AutoUnpersist.persistScoped(
      graft.util.Partitioning.fanOut(docs)
        .withColumn("_toks", TextAnalysis.tokens(col("text")))
        .filter(size(t) >= n)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(t) - n), i =>
            concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*)))
            .as(Seq("pos", "gram"))))
    val freq = windows.groupBy("gram")
      .agg(count(lit(1)).as("rep"))
      .filter(col("rep") >= minRep)
    // freq is gram-vocabulary-scaled — partitioned join unless the
    // corpus anchor proves it small (see Partitioning.indexSideFor)
    val occ = windows.join(
      graft.util.Partitioning.indexSideFor(docs)(freq), "gram")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("rep"))
    // gaps-and-islands: windows sorted by start; a window opens a NEW
    // span iff its start clears the running max end (pos + n) of all
    // earlier windows in the doc — merged spans are maximal by
    // construction (overlap AND back-to-back adjacency both merge)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("pos") + n)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    occ
      .withColumn("_new",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("_island",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "_island")
      .agg(
        min(col("pos")).as("span_start"),
        max(col("pos") + n).as("span_end"),
        count(lit(1)).as("n_windows"),
        max(col("rep")).as("max_rep"))
      .drop("_island")
  }

  /** ExactSubstr-style cross-document substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * length-`n` token window repeated ≥ `minRep` times corpus-wide keeps
    * its FIRST occurrence (lowest `(doc_id, pos)`) and is CUT everywhere
    * else; cut windows merge into maximal spans per doc and the
    * surviving tokens are re-joined — so one copy of every boilerplate
    * passage survives, byte-identical, and the rest of the corpus loses
    * only the repeated region, not whole documents.
    *
    * Pinned replay semantics: the keeper key is `doc_id·10⁹ + pos`
    * (documents must stay under 10⁹ tokens); a keeper window's tokens
    * are still cut if another CUT window covers them (coverage is a
    * union over non-keeper windows — the published recipe's behavior on
    * overlapping repeats). All decisions are integer comparisons over
    * exact counts, so a second engine reproduces the cleaned text — not
    * just the counts — verbatim.
    *
    * Shape: the same corpus-linear window pass as [[repeatedSpans]]
    * (scoped-persisted — frequency branch + join-back), one
    * gram-vocabulary aggregate carrying (rep, keeper) in a single
    * reduction, per-doc gaps-and-islands over CUT windows only, and an
    * array-local reconstruction (no per-token explode: positions are
    * filtered inside one codegen'd HOF against the doc's own span
    * list). Nothing shuffles beyond the gram vocabulary and the cut
    * windows.
    *
    * Out: `(doc_id, text_clean, n_tokens_before, n_tokens_after,
    * n_cut)`.
    */
  def cutRepeatedSpans(
      docs: DataFrame, n: Int = 8, minRep: Int = 2
  ): DataFrame = {
    require(n >= 2 && minRep >= 2, s"degenerate params: n=$n minRep=$minRep")
    val t = col("_toks")
    val windows = graft.util.AutoUnpersist.persistScoped(
      graft.util.Partitioning.fanOut(docs)
        .withColumn("_toks", TextAnalysis.tokens(col("text")))
        .filter(size(t) >= n)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(t) - n), i =>
            concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*)))
            .as(Seq("pos", "gram"))))
    val freq = windows.groupBy("gram")
      .agg(count(lit(1)).as("rep"),
        min(expr("doc_id * 1000000000L + pos")).as("_keep"))
      .filter(col("rep") >= minRep)
    val cut = windows
      .join(graft.util.Partitioning.indexSideFor(docs)(freq), "gram")
      .filter(expr("doc_id * 1000000000L + pos <> _keep"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("pos") + n)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = cut
      .withColumn("_new",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("_island",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "_island")
      .agg(min(col("pos")).as("s"), max(col("pos") + n).as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("_spans"))
    docs
      .join(graft.util.Partitioning.indexSideFor(docs)(spans),
        Seq("doc_id"), "left")
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .withColumn("_sp",
        expr("coalesce(_spans, cast(array() as array<struct<s:bigint,e:bigint>>))"))
      .withColumn("_keptPos",
        filter(
          when(size(t) > 0, sequence(lit(0), size(t) - 1))
            .otherwise(expr("cast(array() as array<int>)")),
          p => !exists(col("_sp"),
            sp => p >= sp.getField("s") && p < sp.getField("e"))))
      .select(col("doc_id"),
        concat_ws(" ",
          transform(col("_keptPos"), p => element_at(t, p + 1)))
          .as("text_clean"),
        size(t).cast("long").as("n_tokens_before"),
        size(col("_keptPos")).cast("long").as("n_tokens_after"),
        (size(t) - size(col("_keptPos"))).cast("long").as("n_cut"))
  }

  /** Memorization-risk profile: per-doc fraction of token positions
    * covered by corpus-repeated spans (from [[repeatedSpans]] — maximal
    * merged islands, so covered positions are counted once), bucketed
    * into coverage deciles. A corpus whose mass sits in the high buckets
    * is boilerplate the LM will memorize; the 0-bucket is the organic
    * text. Buckets are `coverage_bp div 1000` ∈ [0, 10] (10 = exactly
    * fully-covered) — all integer arithmetic after the span pass.
    *
    * Scale: repeatedSpans is the cost (corpus-linear, see there); the
    * coverage join is doc-keyed with the span side aggregated
    * doc-sized-or-smaller first, and the histogram is an 11-row result.
    */
  def spanCoverage(
      docs: DataFrame, n: Int = 8, minRep: Int = 3
  ): DataFrame = {
    val lens = docs
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val cov = repeatedSpans(docs, n, minRep)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("covered"))
    lens.join(graft.util.Partitioning.indexSideFor(docs)(cov),
      Seq("doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .withColumn("cov_decile",
        expr("(covered * 10000 div n_tokens) div 1000"))
      .groupBy("cov_decile")
      .agg(count(lit(1)).as("n_docs"),
        sum("covered").as("covered_tokens"),
        sum("n_tokens").as("total_tokens"))
  }

  /** Content-defined chunking (the rolling-hash boundary rule behind
    * storage dedup and rsync-style delta transfer): a chunk boundary
    * falls after every position whose trailing `w`-char window hashes
    * into a fixed 1-in-64 mask, so boundaries — and therefore chunk
    * identities — depend only on LOCAL content. Insert or delete bytes
    * anywhere and only the chunks touching the edit change; everything
    * downstream re-deduplicates, which fixed-size blocks structurally
    * cannot do. The classic backup/dedup rule (Muhlestein's rsync
    * rolling window; FastCDC's mask test) expressed relationally.
    *
    * One native codegen boundary scan per row (r9 — the scan used to be
    * an explode + collect_list exchange + join-back), then a single
    * posexplode — corpus-linear, ZERO shuffle, embarrassingly parallel
    * per document. The mask test uses
    * md5 of each trailing window (O(len·w) hashing instead of a true
    * O(len) rolling update — the price of staying inside codegen'd
    * engine-replayable expressions; w is small and the constant is the
    * same class as the shingle ops). No min/max chunk-size clamps: the
    * pure mask rule keeps every boundary decision independent, so the
    * operator stays stateless and exactly replayable (FastCDC's clamps
    * make each boundary depend on the previous one — a sequential
    * scan no engine parallelizes within a document).
    *
    * Emits (id, chunk_idx, chunk_start, chunk_len, chunk_md5) — 1-based
    * char offsets; the md5 is the chunk's dedup identity.
    */
  def cdcChunks(
      docs: DataFrame, w: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"
  ): DataFrame = {
    require(w >= 4, s"window too small for a stable mask rule: w=$w")
    val t = col(textCol)
    // 1-in-64 mask on the hex digest of the trailing w chars: mean
    // chunk ≈ 64 chars. r9: the boundary scan runs as a native codegen
    // kernel (graft_cdc_boundaries) emitting the boundary-position
    // array as a pure per-row projection — the previous shape (codegen
    // explode of one row per character position → mask filter →
    // collect_list aggregation → boundaries⋈docs join-back, itself the
    // r7 fix for an interpreted HOF that measured 9.2 → 3.3 s) paid an
    // exchange and a join purely to reassemble per-doc position lists
    // the kernel now returns in place. Same mask rule on the same
    // md5-of-trailing-window, bit-identical positions (CdcSpec pins
    // kernel vs the explode formulation). fanOut stays: a one-file
    // fixture must still spread across slots before the O(len·w)
    // hashing.
    val withChunks = graft.util.Partitioning.fanOut(docs)
      .withColumn("_bpos",
        org.apache.spark.sql.graftshim.GraftShim.column(
          graft.sql.expressions.CdcBoundaries(
            org.apache.spark.sql.graftshim.GraftShim.expression(t), w)))
      .withColumn("_bpos",
        coalesce(col("_bpos"), array().cast("array<int>")))
      .withColumn("_starts",
        concat(array(lit(1)), transform(col("_bpos"), b => b + 1)))
      .withColumn("_ends", concat(col("_bpos"), array(length(t))))
      .withColumn("_chunks",
        filter(
          zip_with(col("_starts"), col("_ends"),
            (s1, e1) => struct(s1.as("cs"), (e1 - s1 + 1).as("cl"))),
          c => c.getField("cl") > 0))
    withChunks
      .select(col(idCol), t, posexplode(col("_chunks")).as(Seq("chunk_idx", "_c")))
      .select(col(idCol), col("chunk_idx"),
        col("_c.cs").as("chunk_start"), col("_c.cl").as("chunk_len"),
        md5(t.substr(col("_c.cs"), col("_c.cl"))).as("chunk_md5"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    * core): hash every token `k`-gram, then in every window of `w`
    * consecutive gram positions keep the minimum hash, ties to the
    * RIGHTMOST position (the paper's robust-winnowing rule). Guarantees:
    * any shared run of ≥ w+k-1 tokens yields at least one shared
    * fingerprint, and the density of selected positions is ~2/(w+1) —
    * a tunable sample with a matching guarantee, which raw modular
    * sampling (0 mod p) lacks.
    *
    * The min-with-rightmost-tie is ONE window aggregate: hash and
    * position pack into a single sortable key, `md5hex ‖ '|' ‖
    * zero-padded (9999999 − pos)` — lexicographic min = (min hash,
    * max pos). Both engines evaluate the identical `min() OVER (ROWS
    * CURRENT ROW .. w-1 FOLLOWING)` frame, so selection is bit-exact.
    * Docs shorter than k+w−1 tokens have no full window and emit no
    * fingerprints (documented edge rule).
    *
    * Scale: one narrow gram explode (factor ≈ tokens/doc), one per-doc
    * window scan (partitions by doc_id — no global sort), one distinct.
    * Emits (doc_id, fp_hash, fp_pos).
    */
  def winnowFingerprints(
      docs: DataFrame, k: Int = 5, w: Int = 4
  ): DataFrame = {
    require(k >= 2 && w >= 2, s"degenerate params: k=$k w=$w")
    val t = col("_toks")
    val grams = graft.util.Partitioning.fanOut(docs)
      .withColumn("_toks", split(col("text"), " "))
      .filter(size(t) >= k + w - 1)
      .select(col("doc_id"), size(t).as("_nt"),
        posexplode(transform(sequence(lit(0), size(t) - k), i =>
          concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*)))
          .as(Seq("pos", "gram")))
      .withColumn("_key", concat(md5(col("gram")), lit("|"),
        lpad((lit(9999999) - col("pos")).cast("string"), 7, "0")))
    val wdw = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("_wkey", min(col("_key")).over(wdw))
      // only full windows select: start positions 0 .. nGrams - w
      .filter(col("pos") <= col("_nt") - (k + w - 1))
      .select(col("doc_id"),
        substring(col("_wkey"), 1, 32).as("fp_hash"),
        (lit(9999999) - substring(col("_wkey"), 34, 7).cast("int"))
          .as("fp_pos"))
      .distinct()
  }

  /** Winnowing match pairs — the MOSS report: docs ranked by shared
    * fingerprints. Fingerprints seen in more than `maxDf` docs are
    * dropped BEFORE the self-join (the boilerplate guard — the same
    * bucket-cap logic every candidate generator here applies, keeping
    * join fan-out ∝ df² of surviving hashes, never corpus²). Overlap is
    * |shared| / min(|A|, |B|) in integer basis points over the kept
    * fingerprint sets.
    */
  def winnowMatches(
      docs: DataFrame, k: Int = 5, w: Int = 4,
      maxDf: Int = 8, minShared: Long = 2L
  ): DataFrame = {
    val fps = winnowFingerprints(docs, k, w)
      .select("doc_id", "fp_hash").distinct()
    // the df table and every join side below are fingerprint-/doc-
    // scaled — partitioned joins unless the corpus anchor proves them
    // small (see Partitioning.indexSideFor)
    val side = graft.util.Partitioning.indexSideFor(docs)
    val kept = graft.util.AutoUnpersist.persistScoped(
      fps.join(
        side(
          fps.groupBy("fp_hash").agg(count(lit(1)).as("_df"))
            .filter(col("_df") <= maxDf)),
        "fp_hash"))
    val cnt = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = kept.select(col("fp_hash"), col("doc_id").as("i"))
      .join(side(
        kept.select(col("fp_hash"), col("doc_id").as("j"))), "fp_hash")
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(side(
        cnt.select(col("doc_id").as("i"), col("n").as("n_i"))), "i")
      .join(side(
        cnt.select(col("doc_id").as("j"), col("n").as("n_j"))), "j")
      .select(col("i"), col("j"), col("n_shared"), col("n_i"), col("n_j"),
        expr("n_shared * 10000 div least(n_i, n_j)").as("overlap_bp"))
  }
}
