package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that collide with
  * an evaluation set on long n-grams — the standard contamination test
  * (a shared long n-gram is strong evidence the benchmark text leaked
  * into the corpus).
  *
  * Shape: both sides shingle to distinct per-doc n-grams; the collision
  * join is an equi-join on the n-gram (never a cross product), and the
  * benchmark side — eval suites are tiny next to a training corpus — is
  * broadcast-sized by construction. Per (doc, benchmark) collision counts
  * come from one groupBy with map-side partials. At 100 TB the corpus
  * side streams; only the benchmark shingle set is materialized.
  *
  * `n` defaults to 5 here because the synthetic corpus documents are
  * ~50 tokens; production decontamination typically uses 8-13-token
  * n-grams for the same mechanics.
  */
object Decontaminate {

  /** (doc_id, benchmark_id, n_hits): distinct shared n-grams per
    * contaminated (corpus doc, benchmark doc) pair, hits ≥ `minHits`.
    */
  def contaminationPairs(
      docs: DataFrame, benchmarks: DataFrame,
      n: Int = 5, minHits: Long = 1L
  ): DataFrame = {
    val corpusSh = Dedup.shingles(docs, n)
    val benchSh = Dedup.shingles(benchmarks, n)
      .withColumnRenamed("doc_id", "benchmark_id")
    corpusSh.join(benchSh, "w")
      .groupBy("doc_id", "benchmark_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Span-level contamination report: for each shared n-gram, WHERE it
    * sits in the corpus document (1-based char offset of the first
    * occurrence, plus span length) — the output a surgical-excision
    * pipeline consumes when dropping whole documents is too blunt
    * (e.g. a long page quoting one benchmark item). Same equi-join
    * shape as [[contaminationPairs]] plus one join back to the corpus
    * text on doc_id; the offset probe is a codegen `instr` projection.
    */
  def contaminationSpans(
      docs: DataFrame, benchmarks: DataFrame, n: Int = 5
  ): DataFrame = {
    val corpusSh = Dedup.shingles(docs, n)
    val benchSh = Dedup.shingles(benchmarks, n)
      .withColumnRenamed("doc_id", "benchmark_id")
    corpusSh.join(benchSh, "w")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("benchmark_id"), col("w").as("ngram"),
        instr(col("text"), col("w")).as("char_offset"),
        length(col("w")).as("span_len"))
  }

  /** The corpus minus every document contaminated by any benchmark —
    * anti-join on the flagged ids.
    */
  def clean(
      docs: DataFrame, benchmarks: DataFrame,
      n: Int = 5, minHits: Long = 1L
  ): DataFrame = {
    val flagged = contaminationPairs(docs, benchmarks, n, minHits)
      .select("doc_id").distinct()
    docs.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** SEMANTIC decontamination: corpus items whose embedding is
    * ≥ `thresholdBp` cosine-close to any benchmark embedding — catches
    * paraphrased/translated benchmark leakage that n-gram collision
    * can't see (the embedding-level complement of [[contaminationPairs]]).
    *
    * Per flagged corpus item: hit count, the max cosine (bp), and the
    * benchmark id achieving it (ties → larger id; a total order, so any
    * engine agrees). The benchmark side is broadcast — eval suites are
    * tiny next to a training corpus, the same asymmetry the n-gram path
    * leans on — so the corpus streams through one codegen projection
    * (FloatVecDot + hoisted norms): no shuffle at all on the big side.
    */
  def semanticPairs(
      corpus: DataFrame, benchmarks: DataFrame, thresholdBp: Long = 4000L,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    import graft.ops.{Similarity => Sim}
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("_vc"), Sim.norm(col(vecCol)).as("_nc"))
    val b = benchmarks.select(col(idCol).as("bench_id"),
      col(vecCol).as("_vb"), Sim.norm(col(vecCol)).as("_nb"))
    c.join(broadcast(b), lit(true))
      .withColumn("cos_bp",
        floor(Sim.dot(col("_vc"), col("_vb")) / (col("_nc") * col("_nb"))
          * 10000).cast("long"))
      .filter(col("cos_bp") >= thresholdBp)
      .groupBy("corpus_id")
      .agg(count(lit(1)).as("n_hits"),
        max(col("cos_bp")).as("max_cos_bp"),
        max(struct(col("cos_bp"), col("bench_id")))
          .getField("bench_id").as("best_bench"))
  }

  /** Fuzzy (edit-distance) contamination: corpus docs whose `prefixLen`-
    * char prefix is within `maxDist` Levenshtein edits of a benchmark
    * prompt's prefix — the screen that catches lightly-reformatted leaks
    * (whitespace drift, a dropped word, OCR noise) that exact n-gram
    * collision misses and embedding cosine over-matches.
    *
    * Shape: the benchmark side (eval suites are tiny next to a training
    * corpus) broadcasts; the corpus streams through ONE scan with no
    * shuffle. The length-difference band (|len(c)−len(b)| ≤ maxDist, a
    * necessary condition for distance ≤ maxDist) is expressed as an
    * EQUI-join on a length bucket of width maxDist+1 — each benchmark
    * row explodes to its bucket ±1, so a corpus row hash-probes at most
    * the benchmarks in 1 bucket instead of evaluating a predicate
    * against every benchmark (a BroadcastNestedLoopJoin would pay
    * |benchmarks| predicate evaluations PER corpus row — the difference
    * between O(corpus) and O(corpus×bench) at 100 TB). Survivors run
    * Spark's THRESHOLD-banded `levenshtein(l, r, d)` kernel —
    * O(prefixLen·maxDist) per pair, not O(prefixLen²), returning −1 the
    * moment the band is exceeded. Both stages are codegen projections.
    *
    * Returns (doc_id, benchmark_id, edit_dist) with edit_dist ≤ maxDist.
    */
  def fuzzyPairs(
      corpus: DataFrame, benchmarks: DataFrame,
      prefixLen: Int = 48, maxDist: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "benchmark_id"
  ): DataFrame = {
    val w = maxDist + 1
    val c = corpus.select(col(idCol).as("doc_id"),
        substring(col(textCol), 1, prefixLen).as("_cp"))
      .withColumn("_bucket", expr(s"length(_cp) div $w"))
    val b = benchmarks.select(col(benchIdCol),
        substring(col(textCol), 1, prefixLen).as("_bp"))
      // a corpus length within ±maxDist of a benchmark length lands in
      // the benchmark's bucket or an adjacent one — replicate ×3, never
      // compare across buckets
      .withColumn("_bucket",
        explode(array((-1 to 1).map(d => expr(s"length(_bp) div $w + $d")): _*)))
    c.join(broadcast(b), Seq("_bucket"))
      .filter(abs(length(col("_cp")) - length(col("_bp"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("_cp"), col("_bp"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select("doc_id", "benchmark_id", "edit_dist")
  }
}
