package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: BM25 scoring — the
  * workhorse ranking function behind keyword search, RAG candidate
  * generation, and decontamination-by-retrieval sweeps.
  *
  * Engine-replayability: the standard BM25 wraps its idf in a log, whose
  * last-ulp behavior is libm-specific — the same reason tf-idf here uses
  * the raw ratio (see [[TextAnalysis.tfidf]]). This variant keeps the
  * rational idf
  *
  *   idf(t) = (N - df(t) + 0.5) / (df(t) + 0.5) + 1
  *
  * un-logged (per-term ranking is unchanged — log is monotone — while
  * the cross-term mix weights rare terms more than log-BM25), and floors
  * each per-(doc,term) contribution to integer micro-units BEFORE the
  * per-doc sum, so the sum is order-independent exact integer arithmetic
  * that any engine replays bit-for-bit. Every double step on the way to
  * the floor is a single IEEE-exact op sequence both engines evaluate in
  * the same association order.
  *
  * Scale shape: one token pass for per-doc lengths (narrow projection,
  * no shuffle), one exploded pass filtered to the query terms BEFORE the
  * shuffle (the term filter prunes the stream to matching tokens only),
  * a term-count-sized df table broadcast back, and one final per-doc
  * aggregation with map-side partials. Nothing is ever corpus × terms.
  */
object Retrieval {

  /** BM25 scores for `terms` over `docs` (`doc_id`, `text`). Returns
    * (doc_id, n_terms, score_micro): matched-term count and the summed
    * contribution in micro-units, descending-ready. Docs matching no
    * term are absent (their score is 0).
    */
  def bm25(
      docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = graft.util.Partitioning.fanOut(docs)
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("_toks"))
    // one row per doc — also the stats source, so a token-less doc still
    // counts toward N and avgdl in both engines
    val lens = graft.util.AutoUnpersist.persistScoped(
      toks.select(col("doc_id"), size(col("_toks")).cast("long").as("dl")))
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // tf feeds two branches of the final plan (the df aggregation and the
    // score join) — scoped-persist it so the exploded token pass runs once
    val tf = graft.util.AutoUnpersist.persistScoped(toks
      .select(col("doc_id"), explode(col("_toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // association order below is mirrored verbatim by the SQL oracle —
    // each double op is IEEE-exact, so the floor input is bit-identical
    val idf = (col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0)
    val dlNorm = lit(1.0) - lit(b) + lit(b) *
      (col("dl").cast("double") / col("avgdl"))
    val contrib = floor(
      lit(1000000.0) * idf * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * dlNorm)).cast("long")
    tf.join(broadcast(df_), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("score_micro"))
  }

  /** Exact phrase search over a positional inverted index: docs
    * containing `phrase` as consecutive whitespace tokens, with match
    * count and first position — the phrase/proximity primitive BM25
    * bag-of-words ranking can't express (and the exact-match tool a
    * contamination audit reaches for after a BM25 candidate sweep).
    *
    * Shape: the token stream is filtered to the PHRASE VOCABULARY before
    * anything shuffles — the postings the query actually touches, the
    * inverted-index access pattern — then each subsequent term aligns by
    * an equi-join on (doc_id, pos − offset). Join inputs are
    * term-postings-sized, never corpus-token-sized; a k-word phrase is
    * k−1 hash joins on keys that shrink monotonically (every join
    * intersects). Nothing compares across documents.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    // postings restricted to phrase terms; persisted because each term
    // re-reads its slice of the same exploded stream
    val postings = graft.util.AutoUnpersist.persistScoped(
      graft.util.Partitioning.fanOut(docs)
        .withColumn("_toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "tok")))
        .filter(col("tok").isin(phrase.distinct: _*)))
    val first = postings.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").cast("long").as("start"))
    val hits = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(postings.filter(col("tok") === w)
            .select(col("doc_id"), (col("pos") - i).cast("long").as("start")),
          Seq("doc_id", "start"))
    }
    hits.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("start").as("first_pos"))
  }

  /** Multi-phrase blocklist matcher — the toxicity/banned-phrase filter
    * at corpus scale, doing Aho-Corasick's job the distributed way:
    * candidate generation on each phrase's RAREST token (one cheap df
    * pass over the phrase vocabulary picks the anchor, so "the zebra"
    * anchors on "zebra", not "the" — candidate volume ∝ the rare
    * token's df, not the stop word's), then exact verification by
    * array-slice equality at the aligned start. ONE corpus match pass,
    * no per-row multi-regex scan, no doc-keyed re-join (the token array
    * rides only the anchor-matched rows); the phrase table broadcasts.
    *
    * Exact-match semantics on whitespace tokens (case as given);
    * docs tokenize on ANY whitespace run (`\s+` — tabs and newlines
    * separate tokens too, matching the phrase-side split, so a phrase
    * spanning a newline still matches); overlapping occurrences each
    * count. Deterministic anchor choice: min (df, offset, token).
    *
    * In: docs (doc_id, text); phrases as plain strings.
    * Out: one row per (doc, phrase) with ≥1 hit: (doc_id, phrase,
    * n_occ, first_pos) — first_pos 1-based.
    */
  def phraseBlocklist(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phraseBlocklist needs phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = phrases.distinct.map { s =>
      val t = s.split("\\s+").filter(_.nonEmpty).toSeq
      require(t.nonEmpty, s"empty phrase: '$s'")
      (s, t)
    }
    val vocab = parsed.flatMap(_._2).distinct
    // \s+ doc split to MATCH the phrase-side split above — a single-space
    // split would leave tabs/newlines embedded in tokens and silently
    // miss phrases spanning them (RetrievalSpec pins the tab case)
    val toks = graft.util.Partitioning.fanOut(docs)
      .withColumn("_t", filter(split(col("text"), "\\s+"), t => t =!= ""))
    // df pass over the phrase vocabulary only (bounded aggregate)
    val dfs = toks
      .select(explode(col("_t")).as("_tok"))
      .filter(col("_tok").isin(vocab: _*))
      .groupBy("_tok").agg(count(lit(1)).as("_df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val table = parsed.map { case (s, t) =>
      val (anchor, off) = t.zipWithIndex
        .minBy { case (w, i) => (dfs.getOrElse(w, 0L), i.toLong, w) }
      (s, t, t.size, anchor, off)
    }.toDF("phrase", "_pt", "_plen", "_anchor", "_off")
    val anchorSet = table.select("_anchor").as[String].collect().distinct
    toks
      .select(col("doc_id"), col("_t"),
        posexplode(col("_t")).as(Seq("_pos", "_tok")))
      .filter(col("_tok").isin(anchorSet.toSeq: _*))
      .join(broadcast(table), col("_tok") === col("_anchor"))
      .withColumn("_start", col("_pos") - col("_off"))
      .filter(col("_start") >= 0 &&
        slice(col("_t"), col("_start") + 1, col("_plen")) === col("_pt"))
      .groupBy("doc_id", "phrase")
      .agg(count(lit(1)).as("n_occ"),
        (min("_start") + 1).cast("long").as("first_pos"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * heterogeneous retrieval runs — the standard hybrid-search combiner
    * (BM25 lexical + dense ANN in a RAG stack). Each run contributes
    * 1/(k + rank) per candidate; candidates strong in EITHER modality
    * surface without any score normalization across incomparable scales
    * (micro-BM25 vs cosine bp) — the property that makes RRF the
    * default fusion baseline. Contributions are fixed-point
    * `10¹² div (k + rank)` BIGINTs, so the fused ordering is exact
    * integer arithmetic any engine replays (ties → more runs, then
    * lower id).
    *
    * In: each run `(query_id, id, score)` ranked by (score desc, id).
    * Out: `(query_id, id, n_runs, rrf_pico, rank)`, top `topK` per
    * query.
    *
    * Scale shape: runs are per-query CANDIDATE lists (top-N from their
    * retrievers), so every window here partitions by query over
    * bounded-size groups and the union/groupBy shuffles candidate rows,
    * not corpus rows. Fusing R runs of N candidates for Q queries costs
    * O(Q·N·R) — retrieval itself dwarfs it.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int = 60, topK: Int = 20): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k >= 1 && topK >= 1, s"degenerate params: k=$k topK=$topK")
    val perQ = Window.partitionBy("query_id")
    val contribs = runs.map { r =>
      r.select(col("query_id"), col("id"), col("score"))
        .withColumn("rank", row_number().over(
          perQ.orderBy(desc("score"), asc("id"))).cast("long"))
        .select(col("query_id"), col("id"),
          expr(s"1000000000000 div ($k + rank)").as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy("query_id", "id")
      .agg(count(lit(1)).as("n_runs"), sum("contrib").as("rrf_pico"))
      .withColumn("rank", row_number().over(
        perQ.orderBy(desc("rrf_pico"), desc("n_runs"), asc("id"))).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** Second-stage reranker — the retrieve-then-rerank architecture's
    * expensive half: first-stage candidates (`query_id, doc_id, rank1`)
    * are rescored by exact token-overlap F1 against the full documents
    * and re-ranked, ties broken by first-stage order (so the rerank
    * strictly refines, never scrambles, stage one). The F1 here is the
    * deterministic stand-in at the exact slot where a cross-encoder
    * model scorer would mount — same join shape, same per-pair batch.
    *
    * Scale shape: ALL work is proportional to |candidates| (queries ×
    * topN), never the corpus — that asymmetry is the whole point of the
    * two-stage architecture. Queries broadcast; the doc-side join is an
    * equi-join on doc_id; the final window runs over ≤topN rows per
    * query. F1 is exact integer bp, replayable anywhere.
    */
  def overlapRerank(
      cands: DataFrame, queries: DataFrame, docs: DataFrame,
      topK: Int = 5, qCol: String = "q_toks", dCol: String = "d_toks"
  ): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("f1_bp"), asc("rank1"))
    cands.join(broadcast(queries), "query_id")
      .join(docs, "doc_id")
      .withColumn("inter",
        size(array_intersect(col(qCol), col(dCol))).cast("long"))
      .withColumn("f1_bp",
        expr(s"(20000 * inter) div (size($qCol) + size($dCol))"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "f1_bp", "rank1", "rank")
  }

  /** Per-rank nDCG gain weight, floor(10⁶ / log₂(rank+1)), for ranks
    * 1..k — computed ONCE on the driver so the libm log never reaches
    * either engine: ranks are bounded by k, and both the Spark plan and
    * the SQL oracle embed the same integer literals. (The engine-side
    * alternative — each engine calling its own log2 — risks ULP
    * disagreement exactly where floor lands on a boundary.)
    */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** IR evaluation metrics for a ranked retrieval run against binary
    * qrels — the eval harness every retrieval/embedding pipeline needs
    * next to its index: per query, hits@k, recall@k, MRR and nDCG@k,
    * all in exact fixed-point (micro/bp integers) so a second engine —
    * or a later re-run — reproduces every metric bit-for-bit.
    *
    * `run`: (query_id, doc_id, rank) with rank 1-based; `qrels`:
    * (query_id, doc_id) relevant pairs. Output one row per query with
    * ≥1 relevant doc.
    *
    * Distributed shape: one equi-join of the rank≤k run slice against
    * qrels (both sides narrow), one per-query aggregation with map-side
    * partials, one join to the qrels counts — no windows, no
    * per-metric re-scans; DCG folds as a SUM of per-rank integer
    * weights ([[ndcgWeights]]), so the reduction is order-free.
    */
  def evalMetrics(run: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    val w = ndcgWeights(k)
    val idcgPrefix = w.scanLeft(0L)(_ + _).tail
    val wArr = array(w.map(lit): _*)
    val pArr = array(idcgPrefix.map(lit): _*)
    val rel = qrels.select(col("query_id"), col("doc_id"),
      lit(true).as("_rel"))
    val nrel = qrels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    run.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        sum(when(col("_rel"), 1L).otherwise(0L)).as("n_hits"),
        min(when(col("_rel"), col("rank"))).as("_fr"),
        sum(when(col("_rel"), element_at(wArr, col("rank")))
          .otherwise(0L)).as("dcg_micro"))
      .join(nrel, "query_id")
      .withColumn("first_rank", coalesce(col("_fr"), lit(0)))
      .withColumn("recall_bp",
        expr("(10000 * n_hits) div n_rel").cast("long"))
      .withColumn("mrr_micro",
        when(col("_fr").isNull, 0L)
          .otherwise(expr("1000000 div _fr")).cast("long"))
      .withColumn("idcg_micro",
        element_at(pArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
      .withColumn("ndcg_bp",
        expr("(10000 * dcg_micro) div idcg_micro").cast("long"))
      .select("query_id", "n_rel", "n_hits", "first_rank", "recall_bp",
        "mrr_micro", "dcg_micro", "idcg_micro", "ndcg_bp")
  }
}
