package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-guided data SELECTION — the step after cleaning/dedup where a
  * 100 TB raw crawl is cut down to the tokens actually worth training on.
  * Two public-recipe selectors:
  *
  *   - [[dsirWeights]]: DSIR-style importance weighting (Xie et al. 2023,
  *     "Data Selection for Language Models via Importance Resampling") —
  *     hashed n-gram bag-of-words likelihood ratio between a small target
  *     domain and the raw pool.
  *   - [[logisticQuality]]: a fastText-style linear quality classifier
  *     (the GPT-3/LLaMA "quality filtering" slot) trained INSIDE the
  *     engine as full-batch gradient descent, each iteration one
  *     distributed aggregation.
  *
  * Both are built for engine-exact replay: every floating-point reduction
  * is either quantized to integer basis points BEFORE the order-free sum
  * or folded in a fixed order, so a second engine (the DuckDB oracle)
  * reproduces the scores bit-for-bit.
  */
object DataSelect {

  /** Hash bucket for a DSIR feature: first 6 hex digits of
    * md5("dsir:" + gram), mod `buckets` — the same md5-derived family as
    * [[Sketches.cmsBucket]], so the oracle rebuilds it digit-by-digit.
    */
  def dsirBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("dsir:"), gram)), 1, 6), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Deterministic per-stratum hash sampling — the eval-carve-out /
    * per-source-downsampling primitive: keep a row iff the first 8 hex
    * digits of md5(id), taken mod 10⁴, fall under its stratum's
    * `rate_bp`. Membership is a pure function of the id, so the sample
    * is STABLE under corpus growth, reordering, and re-runs — the
    * property an eval split needs so yesterday's held-out docs don't
    * drift into today's train set (`rand()`-based sampling has none of
    * these guarantees, and Bernoulli `sample()` isn't stratified).
    *
    * `rates` is `(keyCol, rate_bp)`, one row per stratum — a
    * stratum-domain-sized table (sources/languages/shards: at most
    * thousands of rows at any corpus size), so Catalyst's broadcast of
    * the equi-join is correct at 100 TB; rows whose stratum has no rate
    * row are dropped (inner join = explicit allowlist). The whole op is
    * scan → broadcast-join → filter: no shuffle of the corpus at all,
    * and the filter's md5 is codegen.
    *
    * The 8-digit bucket (2³² domain) mod 10⁴ carries a relative
    * non-uniformity of ~2⁻³², i.e. exact to far below one basis point —
    * unlike a 4-digit bucket (65536 % 10⁴ leaves residues 0–5535 ~8%
    * overweighted). Buckets replay digit-exactly in any engine with md5.
    */
  def stratifiedSample(rows: DataFrame, rates: DataFrame,
      idCol: String = "doc_id", keyCol: String = "source"): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(10000L))
    rows.join(rates, keyCol)
      .filter(bucket < col("rate_bp"))
      .select(rows.columns.map(col) :+ col("rate_bp"): _*)
  }

  /** Epoch-seeded deterministic training-order shuffle — the data-loader
    * primitive (the batch formulation of MosaicML-StreamingDataset /
    * Megatron-style epoch shuffling): every document's position in the
    * epoch's global order is a pure function of (epoch, doc_id), so the
    * order is reproducible across re-runs and resumptions, DIFFERENT
    * across epochs, and statistically interleaves sources (an md5 key
    * scatters each source uniformly — no clumped source runs, which is
    * what plain source/doc_id-ordered reads feed the trainer).
    *
    * Global order = (shard, pos): the key's top bits pick the shard, so
    * shards are CONTIGUOUS key ranges and concatenating shards 0..n−1
    * IS the global permutation — a range-partitioned global sort where
    * every shard sorts independently (the only scale-safe global sort;
    * same shape Spark's own orderBy uses, but with deterministic
    * hash-derived ranges instead of sampled ones, so a resumed job or a
    * second engine lands every doc at the identical position).
    * `nShards` must divide the 2³² key domain (powers of two) so range
    * width is exact integer arithmetic in any engine.
    *
    * Per-task state is bounded TWO-LEVEL, not per-shard: ranks are
    * computed within fine sub-shards (the next `subShards` key ranges
    * below the shard bits — contiguous, so sub-shard order IS key
    * order), then shifted by cumulative sub-shard counts (a window over
    * the nShards×subShards count table, bounded domain). A task
    * therefore buffers corpus/(nShards·subShards) rows — with the
    * defaults 1/4096 of the corpus — instead of a whole shard, so
    * `nShards` can stay semantic (how many trainer files) without the
    * rank step inheriting its granularity. `pos` is a pure function of
    * (epoch, key order) — identical for any subShards value.
    *
    * Returns docs + `(order_key, shard, pos)`; pos is 1-based within
    * shard.
    */
  def epochShuffle(docs: DataFrame, epoch: Int, nShards: Int = 16,
      idCol: String = "doc_id", subShards: Int = 256): DataFrame = {
    require(nShards > 0 && 4294967296L % nShards == 0,
      s"nShards must divide 2^32: $nShards")
    val width = 4294967296L / nShards
    // pos is provably identical for ANY sub-shard count, so clamp rather
    // than require: a very fine nShards (width < subShards) just uses
    // width sub-shards of size 1 — both are powers of two, so the
    // clamped value always divides
    val eff = math.min(subShards.toLong, width)
    require(eff > 0 && width % eff == 0,
      s"subShards must divide the shard width: $subShards (width $width)")
    val fineWidth = width / eff
    // 8 hex digits < 2^32 by construction — no reduction needed
    val key = conv(substring(md5(concat(lit(s"ep$epoch:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val keyed = docs.withColumn("order_key", key)
      .withColumn("shard", expr(s"order_key div $width"))
      .withColumn("_fine", expr(s"order_key div $fineWidth"))
    val subRank = keyed.withColumn("_r", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("_fine")
        .orderBy("order_key", idCol)).cast("long"))
    // offsets: docs in the same shard's EARLIER sub-shards — a cumsum
    // over the bounded (nShards·subShards)-row count table
    val offsets = subRank.groupBy("shard", "_fine")
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy("_fine").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            -1)), lit(0L)))
      .select("_fine", "_off")
    subRank.join(broadcast(offsets), "_fine")
      .withColumn("pos", expr("_off + _r"))
      .drop("_fine", "_r", "_off")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * stable-sharding primitive for dataset snapshots that get re-sharded
    * as they grow: doc d lands on `argmax_s md5(d # s)`, so growing from
    * n to m shards moves EXACTLY the docs whose new max lands in a new
    * shard — an expected (m−n)/m of the corpus — versus ~(1−1/lcm-ish)
    * under `hash(d) mod n`, which reshuffles almost everything. Stable
    * assignment keeps downstream caches, dedup indexes, and resumable
    * training manifests valid for the ~n/m docs that never move
    * (Thaler & Ravishankar 1998, the object-placement original).
    *
    * Determinism: the per-shard weight is the first 12 hex digits of
    * md5, disambiguated injectively as `weight·nShards + s` (so ties —
    * impossible in practice at 48 bits, but the contract doesn't lean on
    * that — break toward the higher shard id identically in any engine);
    * `shard = argmax % nShards`. Requires nShards ≤ 16384 so the
    * combined key stays far inside BIGINT (2⁴⁸·2¹⁴ = 2⁶²).
    *
    * Shape: a pure per-row projection — ONE pass, no shuffle, no join;
    * the nShards-way weight scan is a codegen'd array fold per row.
    * Cost is O(rows·nShards) hashes; for nShards beyond ~10³ prefer
    * two-level assignment (rendezvous over shard GROUPS, then within),
    * which composes from this same op.
    */
  def rendezvousShard(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id", out: String = "shard"): DataFrame = {
    require(nShards >= 1 && nShards <= 16384,
      s"nShards out of the BIGINT-safe range: $nShards")
    val weights = transform(sequence(lit(0), lit(nShards - 1)), s =>
      conv(substring(md5(concat(col(idCol).cast("string"), lit("#"),
        s.cast("string"))), 1, 12), 16, 10).cast("long") * nShards +
        s.cast("long"))
    docs.withColumn(out, pmod(array_max(weights), lit(nShards.toLong)))
  }

  /** DSIR importance weights over hashed unigram+bigram features.
    *
    * The target distribution is learned from the rows where `isTarget`
    * holds (the curated domain sample — a few thousand docs is enough);
    * the raw distribution from ALL rows. Each feature bucket `b` gets an
    * add-1-smoothed log likelihood ratio
    *
    *   lr(b) = ln( ((c_t(b)+1)/(N_t+B)) / ((c_r(b)+1)/(N_r+B)) )
    *
    * quantized to integer basis points (`floor(lr·10⁴)`), and a document
    * scores `Σ_g c_g(doc) · lr_bp(bucket(g))` — a pure BIGINT sum, so the
    * reduction is associative and partition-order-free. Resampling =
    * take the top-n by score (deterministic; the published recipe adds
    * Gumbel noise for a soft sample — swap the ORDER BY key for
    * `score_bp + gumbel(seed)` to get it, nothing else changes).
    *
    * Scale shape: one explode over tokens (the corpus pass), one
    * (doc,bucket) partial-aggregated count, and a `buckets`-row ratio
    * table that is BROADCAST back — no shuffle grows with the vocabulary,
    * only with the corpus. At 100 TB raise `buckets` to ~10⁵ (DSIR's
    * published setting); the ratio table is still KBs. The BIGINT
    * products inside the ratio stay exact while `(N+B)·max_count <
    * 2⁶³`; far past any real corpus since counts are per-bucket.
    *
    * Out: `(doc_id, score_bp, n_feats)` — one row per input doc that has
    * at least one token.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 256): DataFrame = {
    val t = col("_toks")
    val grams = graft.util.Partitioning.fanOut(docs)
      .withColumn("_tgt", isTarget)
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .filter(size(t) >= 1)
      .select(col("doc_id"), col("_tgt"),
        explode(concat(t,
          when(size(t) >= 2,
            transform(sequence(lit(0), size(t) - 2), i =>
              concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
            .otherwise(array()))).as("gram"))
    val docBuckets = grams
      .groupBy(col("doc_id"), col("_tgt"),
        dsirBucket(col("gram"), buckets).as("b"))
      .agg(count(lit(1)).as("c"))
    val bucketCounts = docBuckets.groupBy("b").agg(
      sum("c").as("cr"),
      sum(when(col("_tgt"), col("c")).otherwise(0L)).as("ct"))
    // totals are two scalars; the B-row table crossjoins them for free
    val totals = bucketCounts.agg(
      sum("cr").as("nr"), sum("ct").as("nt"))
    val lrTable = bucketCounts.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(log(
          ((col("ct") + 1L) * (col("nr") + buckets.toLong)).cast("double") /
            ((col("cr") + 1L) * (col("nt") + buckets.toLong)).cast("double"))
          * 10000).cast("long").as("lr_bp"))
    docBuckets.join(broadcast(lrTable), "b")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("lr_bp")).as("score_bp"),
        sum("c").as("n_feats"))
  }

  /** One training step's state: weights (bias first, then one per
    * feature) and the training-set accuracy of those weights.
    */
  final case class LrStep(step: Int, weights: Seq[Double], nCorrect: Long)

  /** A linear quality classifier trained INSIDE the engine: full-batch
    * logistic regression by gradient descent, where every iteration is
    * ONE distributed aggregation (map-side-combined partial sums — the
    * exact shape distributed LR takes on a real cluster; the driver only
    * ever holds the weight vector). The standard use is DISTILLING a
    * hard heuristic gate (a Gopher-rule cascade, a curated-vs-crawl
    * membership bit) into a soft score that can rank, budget, and
    * threshold-sweep where a boolean can't.
    *
    * Engine-exact replay: the only libm call is `exp` inside the
    * sigmoid, and every per-doc gradient contribution is quantized to
    * integer MICRO-units (`floor(g·10⁶)`) before the sum — so the
    * distributed reduction is associative BIGINT arithmetic, partition
    * order can't move it, and a second engine reproduces the whole
    * trajectory from the same update expressions. Accuracy uses
    * `z ≥ 0`, which needs no transcendental at all.
    *
    * `rows` must provide `label` and each feature as deterministic
    * columns. Returns the (iters)-row training trace: weights after each
    * update plus that step's training accuracy — a rising `n_correct`
    * is the in-band proof the classifier learns, not just runs.
    *
    * Scale: the per-iteration cost is one pass over the data with a
    * (k+1)-long partial aggregate; iterations are a driver-side loop
    * exactly like MLlib's. At 100 TB you'd train on a sampled slice
    * (classifier training needs ~10⁶ rows, not 10¹¹) and SCORE the full
    * corpus with the final weights — scoring is a pure projection.
    */
  def logisticTrace(rows: DataFrame, label: Column, features: Seq[Column],
      iters: Int = 8, lrate: Double = 4.0): Seq[LrStep] = {
    val k = features.size
    require(k >= 1, "need at least one feature")
    val feats = rows.select(
      when(label, 1.0).otherwise(0.0).as("y") +:
        features.zipWithIndex.map { case (f, i) => f.as(s"x${i + 1}") }: _*)
      .localCheckpoint(true)
    val n = feats.count()
    var w = Array.fill(k + 1)(0.0)
    def z(wv: Array[Double]): Column =
      (1 to k).foldLeft(lit(wv(0)): Column)((acc, j) =>
        acc + lit(wv(j)) * col(s"x$j"))
    val trace = Seq.newBuilder[LrStep]
    for (step <- 1 to iters) {
      val diff = lit(1.0) / (lit(1.0) + exp(-z(w))) - col("y")
      val gradCols =
        floor(diff * 1000000.0).cast("long") +:
          (1 to k).map(j => floor((diff * col(s"x$j")) * 1000000.0).cast("long"))
      val sums = gradCols.map(c => sum(c))
      val g = feats.agg(sums.head, sums.tail: _*).head()
      w = Array.tabulate(k + 1)(j =>
        w(j) - lrate * (g.getLong(j).toDouble / (n * 1000000.0)))
      val correct = feats.filter((z(w) >= 0.0) === (col("y") === 1.0)).count()
      trace += LrStep(step, w.toSeq, correct)
    }
    trace.result()
  }

  /** Bigram-LM perplexity scoring — the CCNet/KenLM filter slot: train a
    * language model on a trusted corpus, score every raw doc by how
    * surprised the model is, and drop the gibberish tail.
    *
    * The model is add-1-smoothed bigram MLE over the rows where
    * `trainOn` holds: `P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V)` with
    * `c(w₁·)` the bigram-prefix count and `V` the train-corpus distinct
    * token count. Each bigram's log-prob is quantized to integer basis
    * points at the JOINED row — before any per-doc reduction — so the
    * doc score `nll_bp = -Σ c·lp_bp` is an order-free BIGINT sum a
    * second engine replays exactly, the same discipline as
    * [[dsirWeights]]. (A 5-gram Kneser-Ney model is the production
    * choice; it changes the count tables and the smoothing formula,
    * not this join/quantize/sum shape.)
    *
    * Scale shape: bigram/prefix count tables are vocabulary²-bounded
    * (corpus-size-independent) and joined on token keys with map-side
    * partial aggregation — the model tables SHUFFLE-join rather than
    * broadcast because a web-scale bigram table outgrows the driver.
    * No cross product; the only scalar (V) broadcasts as one row.
    *
    * Out: `(doc_id, n_bigrams, nll_bp, nll_per_tok_bp)`, one row per
    * doc with ≥2 tokens; higher `nll_per_tok_bp` = more surprising.
    */
  def lmScore(docs: DataFrame, trainOn: Column,
      textCol: String = "text"): DataFrame = {
    val t = col("_toks")
    val base = graft.util.Partitioning.fanOut(docs)
      .withColumn("_train", trainOn)
      .withColumn("_toks", TextAnalysis.tokens(col(textCol)))
    val vRow = base.filter(col("_train"))
      .select(explode(t).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val bg = base.filter(size(t) >= 2)
      .select(col("doc_id"), col("_train"),
        explode(transform(sequence(lit(0), size(t) - 2), i =>
          struct(element_at(t, i + 1).as("w1"),
            concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))
              .as("gram")))).as("p"))
      .select(col("doc_id"), col("_train"), col("p.w1"), col("p.gram"))
    val dbg = bg.groupBy("doc_id", "_train", "w1", "gram")
      .agg(count(lit(1)).as("c"))
    val trainB = dbg.filter(col("_train")).groupBy("gram")
      .agg(sum("c").as("cb"))
    val trainU = dbg.filter(col("_train")).groupBy("w1")
      .agg(sum("c").as("cu"))
    dbg
      .join(trainB, Seq("gram"), "left")
      .join(trainU, Seq("w1"), "left")
      .crossJoin(broadcast(vRow))
      .withColumn("lp_bp", floor(log(
        (coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast("double"))
        * 10000).cast("long"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        (-sum(col("c") * col("lp_bp"))).as("nll_bp"))
      .withColumn("nll_per_tok_bp", expr("nll_bp div n_bigrams"))
  }

  /** Interpolated Kneser-Ney bigram scoring — the smoothing the real
    * CCNet/KenLM perplexity filter uses, where [[lmScore]]'s add-1 is
    * the didactic baseline: absolute discount `d` with the
    * continuation-probability backoff
    *
    *   P(w₂|w₁) = max(c(w₁w₂)−d, 0)/c(w₁)
    *            + d·N₁₊(w₁·)/c(w₁) · N₁₊(·w₂)/T
    *
    * (N₁₊ = distinct-continuation counts, T = distinct bigram types in
    * the training slice). Unlike add-1, frequent-but-narrow contexts
    * ("San Francisco") don't inflate unseen continuations — the
    * standard fix that makes perplexity filters sharper on boilerplate.
    *
    * Everything is exact integer: P lands in micro-units over the
    * common denominator c(w₁)·T (each term provably ≤ 1, floored at 1
    * micro so unseen-everything bigrams stay loggable), and the NLL uses
    * the fixed-point log2 — so unlike [[lmScore]]'s floored double log,
    * the VALUE replays bit-for-bit in any engine. `d` stays an integer
    * count (1 = the classic 0.75 rounded up; counts are integers here).
    * Contexts unseen in training back off to the pure continuation
    * distribution. BIGINT bound: c(w₁)·T < 2⁶³/10⁶ — for corpora past
    * ~10⁸ bigram types, score against a trimmed training slice (KN
    * tables are always pruned at scale; KenLM does the same).
    *
    * Shape: the training tables are bigram-TYPE-sized (vocab², tiny
    * next to the corpus) and the per-doc stream joins them by key —
    * map-side-combinable counts, equi-joins, one value-domain log
    * projection; no windows, no driver state.
    *
    * Out: `(doc_id, n_bigrams, nll_fix, nll_per_tok_millibits)` for
    * every doc with ≥2 tokens (train docs score too — their fit is the
    * calibration readout).
    */
  def lmScoreKN(docs: DataFrame, trainOn: Column, d: Long = 1L,
      textCol: String = "text"): DataFrame = {
    require(d >= 1L, s"discount must be a positive count: $d")
    val t = col("_toks")
    val base = graft.util.Partitioning.fanOut(docs)
      .withColumn("_train", trainOn)
      .withColumn("_toks", TextAnalysis.tokens(col(textCol)))
    val dbg = base.filter(size(t) >= 2)
      .select(col("doc_id"), col("_train"),
        explode(transform(sequence(lit(0), size(t) - 2), i =>
          struct(element_at(t, i + 1).as("w1"),
            element_at(t, i + 2).as("w2")))).as("p"))
      .select(col("doc_id"), col("_train"), col("p.w1"), col("p.w2"))
      .groupBy("doc_id", "_train", "w1", "w2")
      .agg(count(lit(1)).as("c"))
    // bigram-type-sized; checkpointed — four derived tables read it
    val train = dbg.filter(col("_train"))
      .groupBy("w1", "w2").agg(sum(col("c")).as("cb"))
      .localCheckpoint(true)
    val cu = train.groupBy("w1")
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1w1"))
    val nc = train.groupBy("w2").agg(count(lit(1)).as("ncw2"))
    val tRow = train.agg(count(lit(1)).as("tt"))
    val scored = dbg
      .join(train, Seq("w1", "w2"), "left")
      .join(cu, Seq("w1"), "left")
      .join(nc, Seq("w2"), "left")
      .crossJoin(broadcast(tRow))
      .withColumn("_p", expr(
        s"""greatest(
           |  if(cu is null or cu <= 0,
           |     coalesce(ncw2, 0L) * 1000000L div tt,
           |     (greatest(coalesce(cb, 0L) - $d, 0L) * tt
           |       + $d * n1w1 * coalesce(ncw2, 0L)) * 1000000L
           |       div (cu * tt)),
           |  1L)""".stripMargin))
    val lfix1e6 = TextAnalysis.pseudoLog2Long(1000000L)
    TextAnalysis.withPseudoLog2(scored, "_p", "_lp")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        sum(expr(s"c * (${lfix1e6}L - _lp)")).as("nll_fix"))
      .withColumn("nll_per_tok_millibits",
        expr("(nll_fix div n_bigrams) * 1000 div 65536"))
  }

  /** Engine-exact pseudo-exponential `E(x) = (1 + x/256)²⁵⁶` computed by
    * eight squarings — every step a plain IEEE multiply, so any engine
    * replays it bit-for-bit where a libm `exp` could differ in the last
    * ulp exactly where a floor lands. Within 0.2% of eˣ for |x| ≤ 1.
    */
  def pseudoExp(x: Double): Double = {
    var e = 1.0 + x / 256.0
    var i = 0
    while (i < 8) { e = e * e; i += 1 }
    e
  }

  /** DoReMi-style mixture-weight optimization (Xie et al. 2023's
    * multiplicative-weights core): domains with persistent excess loss
    * get their sampling weight scaled up by `E(η·ℓ_d)` each round, then
    * the weights renormalize — closing the data-selection family
    * (DSIR resampling, classifier scores, perplexity gates) with the
    * MIXTURE slot. The published method reads ℓ from a proxy-model
    * training run; here ℓ is an input column, so any loss source mounts
    * (the oracle query feeds per-source quality deficit).
    *
    * Determinism discipline: the multiplier uses [[pseudoExp]] (no libm),
    * per-round weights re-quantize to integer micro-units BEFORE the
    * normalization sum, and the normalization divides BIGINTs — so the
    * whole trajectory is replayable arithmetic, round by round.
    *
    * Scale shape: ONE distributed aggregation folds the corpus to a
    * domains-sized loss table (map-side partials); the T-round loop runs
    * on the driver over that table — domains number tens, exactly like
    * the k-means centroid loop — and the result broadcasts back wherever
    * per-doc sampling needs it.
    *
    * Out: (domain, n_docs, loss_bp, weight_micro), weights summing to
    * ≤10⁶ (floor rounding), one row per domain, ordered by domain.
    */
  /** Corpus-composition audit against a declared target mix — the
    * release gate that catches a crawl whose source/language balance
    * silently drifted from the data card: per stratum, the observed
    * share (basis points), the declared target `q_bp`, the signed
    * deviation, and the stratum's χ²-style imbalance contribution
    *
    *   term_e4 = (p_bp − q_bp)² div q_bp        (= 10⁴·(p−q)²/q)
    *
    * Pearson's χ² statistic is `N · Σ term_e4 / 10⁴` — reported
    * per-stratum so the N multiplication (and its BIGINT bound) stays
    * with the caller; the terms themselves are N-free shares, exact at
    * any corpus size. Strata present in the corpus but missing a quota
    * get q_bp = 0 and a NULL term (an undeclared stratum is a finding,
    * not an arithmetic input); declared strata absent from the corpus
    * appear with n_docs = 0.
    *
    * Shape: one map-side-combinable stratum count + a broadcast join
    * against the quota table (strata are sources/languages — hundreds).
    * Nothing shuffles beyond the stratum domain.
    */
  def mixAudit(docs: DataFrame, quotas: DataFrame,
      stratumCol: String = "stratum"): DataFrame = {
    val obs = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val j = obs.join(broadcast(quotas), Seq(stratumCol), "full_outer")
      .na.fill(0L, Seq("n_docs"))
    j.crossJoin(j.agg(sum(col("n_docs")).as("_n"))) // one-row broadcast
      .withColumn("p_bp", expr("n_docs * 10000 div _n"))
      .withColumn("dev_bp", expr("p_bp - coalesce(q_bp, 0L)"))
      .withColumn("chi2_term_e4",
        expr("if(q_bp is null or q_bp <= 0, null, " +
          "(p_bp - q_bp) * (p_bp - q_bp) div q_bp)"))
      .select(col(stratumCol), col("n_docs"), col("p_bp"),
        col("q_bp"), col("dev_bp"), col("chi2_term_e4"))
  }

  def doremiMix(
      docs: DataFrame, domainCol: String, lossBp: Column,
      iters: Int = 4, etaBp: Long = 5000L
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // loss must be non-negative so integer division below is floor-safe
    val stats = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(lossBp).as("_ls"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2) / r.getLong(1)))
      .sortBy(_._1)
    val mult = stats.map { case (_, _, l) =>
      pseudoExp((etaBp.toDouble / 10000.0) * (l.toDouble / 10000.0))
    }
    var w = stats.map(_ => 1000000L / stats.length)
    for (_ <- 0 until iters) {
      val raw = w.zip(mult).map { case (wi, e) =>
        math.floor(wi.toDouble * e).toLong
      }
      val tot = raw.sum
      w = raw.map(r => 1000000L * r / tot)
    }
    spark.createDataset(stats.zip(w).toSeq.map { case ((d, n, l), wi) =>
      (d, n, l, wi)
    }).toDF("domain", "n_docs", "loss_bp", "weight_micro")
  }
}
