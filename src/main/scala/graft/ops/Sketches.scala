package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting for corpus bookkeeping at 100 TB.
  *
  * An exact `countDistinct` over a corpus-scale column is a full shuffle
  * of every distinct value; a cardinality REPORT (how many unique
  * documents/shingles/urls per source, per day, overall) doesn't need
  * exactness. Datasketches HLL (Spark's `hll_sketch_agg` family, codegen,
  * map-side partials) gives ~±2% at lgK=12 for a few KB per group — and,
  * critically, sketches MERGE: per-partition/per-day sketches union into
  * rollups without touching the raw data again, which is what makes
  * incremental corpus accounting possible (sketch today's shard, union
  * with the running sketch; never re-scan history).
  *
  * Not DuckDB-oracle-able (different HLL implementations), so the
  * contract is pinned by SketchesSpec: error bounds vs exact counts and
  * exact associativity of the merge path.
  */
object Sketches {

  /** Per-group HLL sketch of `of`'s distinct values (binary column
    * `sketch`). lgK = 12 → ~±2% relative standard error, ~4 KB/sketch.
    */
  def distinctSketch(
      df: DataFrame, of: Column, groupBy: Seq[Column], lgK: Int = 12
  ): DataFrame =
    df.groupBy(groupBy: _*)
      .agg(hll_sketch_agg(of, lit(lgK)).as("sketch"))

  /** Merge per-group sketches (e.g. daily shards) into one sketch per
    * coarser key — no raw data involved.
    */
  def mergeSketches(sketches: DataFrame, groupBy: Seq[Column]): DataFrame =
    sketches.groupBy(groupBy: _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Estimated distinct count from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One-shot approximate distinct per group (sketch + estimate). */
  def approxDistinct(
      df: DataFrame, of: Column, groupBy: Seq[Column], lgK: Int = 12
  ): DataFrame =
    distinctSketch(df, of, groupBy, lgK)
      .withColumn("approx_distinct", estimate(col("sketch")))
      .drop("sketch")

  /** Rolling distinct cardinality — "unique users in the trailing
    * `window` buckets, per bucket" — at sketch cost: ONE corpus pass
    * builds a per-bucket HLL table (bucket-count-sized, tiny), then
    * `hll_union_agg` runs as a WINDOW aggregate over a RANGE frame of
    * the trailing buckets, so gaps in the bucket axis shorten the
    * frame instead of silently widening it (a ROWS frame would span
    * 24 *present* rows, not 24 hours). The trailing union re-merges
    * each frame — cost = buckets × window sketch merges, all on the
    * tiny table, never the corpus. The exact twin (offset-explode +
    * count distinct) pays corpus × window rows; this pays corpus × 1.
    *
    * In: rows with a BIGINT `bucketCol`. Out: one row per observed
    * bucket with `rolling_distinct` (estimate over [bucket-window+1,
    * bucket]).
    */
  def rollingDistinct(
      df: DataFrame, bucketCol: String, of: Column, window: Int = 24,
      lgK: Int = 12
  ): DataFrame = {
    require(window >= 1)
    val hourly = distinctSketch(df, of, Seq(col(bucketCol)), lgK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(bucketCol))
      .rangeBetween(-(window.toLong - 1), 0)
    hourly
      .withColumn("rolling_distinct",
        estimate(hll_union_agg(col("sketch")).over(w)))
      .drop("sketch")
  }

  /** Pairwise set-overlap estimates between groups from their HLL
    * sketches alone — inclusion-exclusion over the union estimate:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). The input is one sketch row
    * per group (groups-sized, NOT data-sized), so the pairwise self-join
    * is trivially small however big the underlying data was; sketch once
    * while scanning, overlap any pair later without re-reading anything —
    * the mergeable-sketch algebra that makes cross-corpus audits free at
    * 100 TB. Exactness twin: q_text_vocab_overlap gates the same numbers
    * exactly at test scale; SketchesSpec bounds this estimator against it.
    *
    * In: `(key, sketch)` rows from [[distinctSketch]].
    * Out: `key_a, key_b (key_a < key_b), est_a, est_b, est_union,
    * est_common` (clamped at ≥0 — inclusion-exclusion can go slightly
    * negative on disjoint sets).
    */
  def sketchOverlap(sketches: DataFrame, keyCol: String = "key"): DataFrame = {
    val a = sketches.select(col(keyCol).as("key_a"), col("sketch").as("_sa"))
    val b = sketches.select(col(keyCol).as("key_b"), col("sketch").as("_sb"))
    a.join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        hll_sketch_estimate(col("_sa")).as("est_a"),
        hll_sketch_estimate(col("_sb")).as("est_b"),
        hll_sketch_estimate(hll_union(col("_sa"), col("_sb")))
          .as("est_union"))
      .withColumn("est_common",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  /** Count-min row/bucket for `value` in sketch row `row`: the first six
    * hex digits of md5("cms:row:value") mod `width`. md5-derived like the
    * LSH hyperplane family, so a second engine rebuilds the identical
    * sketch (DuckDB replays the digit arithmetic in the oracle SQL).
    */
  def cmsBucket(value: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms:$row:"), value)), 1, 6), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-min sketch of `of`'s frequencies: `depth`×`width` counters as a
    * (row, bucket, cnt) table — at most depth·width rows regardless of
    * corpus size. Each row is an independent hash; the estimate for a value
    * is the MIN over rows of its bucket's counter (always ≥ the true count;
    * error ≤ 2N/width with prob 1-2^-depth).
    *
    * Like the HLL sketches above, CMS tables MERGE by summing counters
    * bucket-wise ([[mergeCountMin]]) — per-shard sketches roll up into a
    * corpus sketch without re-scanning raw data, which is what makes
    * frequency accounting (stopword lists, heavy-hitter token tracking)
    * incremental at 100 TB. The build is one groupBy over depth×N rows
    * with map-side partials; the probe side joins against a table small
    * enough to broadcast.
    */
  def countMinSketch(
      df: DataFrame, of: Column, depth: Int = 4, width: Int = 1024
  ): DataFrame =
    df.select(
        posexplode(array((0 until depth).map(r =>
          cmsBucket(of, r, width)): _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Sum per-shard CMS tables counter-wise into one sketch. */
  def mergeCountMin(sketches: DataFrame): DataFrame =
    sketches.groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))

  /** Equi-join size estimation by count-min inner product (the
    * AGMS/Cormode-Muthukrishnan estimator): the true size of A ⋈ₖ B is
    * Σ_v fA(v)·fB(v) — the inner product of the key-frequency vectors —
    * and each sketch row estimates it as Σ_w cmsA[d][w]·cmsB[d][w].
    * Colliding keys only ADD positive cross terms, so every row
    * overestimates and the MIN over rows is the estimate; expected
    * additive error per row is |A|·|B|/width, so SIZE THE WIDTH to the
    * input product (width ≈ |A|·|B|/(0.1·expected-join-size) for ~10%
    * error — sketch rows are cheap, the estimate never touches the
    * inputs). That's the point at 100 TB: join planning, skew triage,
    * and shuffle budgeting from two broadcast-sized counter tables,
    * with no scan of either input beyond the one pass that built the
    * sketches (which shards/days can build incrementally and
    * [[mergeCountMin]] fold together). BIGINT bound: Σ_w cntA·cntB <
    * 2⁶³ per row, i.e. |A|·|B| < 2⁶³ — any real input.
    *
    * Out: one row `(join_size_est, depth)`.
    */
  def cmsJoinSize(cmsA: DataFrame, cmsB: DataFrame): DataFrame =
    cmsA.select(col("row"), col("bucket"), col("cnt").as("_ca"))
      .join(cmsB.select(col("row"), col("bucket"), col("cnt").as("_cb")),
        Seq("row", "bucket"))
      .groupBy("row").agg(sum(expr("_ca * _cb")).as("_ip"))
      .agg(min(col("_ip")).as("join_size_est"),
        count(lit(1)).as("depth"))

  /** Equi-width histogram sketch of a numeric column over a fixed
    * [lo, hi) domain: `bins` counters as a (bin, cnt) table — at most
    * `bins` rows regardless of corpus size, one groupBy with map-side
    * partials to build. Out-of-domain values clamp into the edge bins.
    *
    * The third mergeable-sketch family next to HLL (distincts) and CMS
    * (frequencies): histogram tables MERGE by bucket-wise sum
    * ([[mergeHistograms]]), so per-shard/per-day histograms roll up
    * into corpus quantile estimates without re-scanning raw data — the
    * alternative to an exact percentile's full sort at 100 TB. Unlike
    * t-digest/KLL the bin layout is deterministic arithmetic, which is
    * what lets a SQL oracle rebuild the identical sketch bit-for-bit.
    */
  def histogramSketch(
      df: DataFrame, of: Column, lo: Double, hi: Double, bins: Int
  ): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    val width = (hi - lo) / bins
    df.select(
        least(lit(bins - 1), greatest(lit(0),
          floor((of - lit(lo)) / lit(width)).cast("int"))).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum per-shard histogram tables bucket-wise into one sketch. */
  def mergeHistograms(sketches: DataFrame): DataFrame =
    sketches.groupBy("bin").agg(sum(col("cnt")).as("cnt"))

  /** Estimate quantiles from a histogram sketch: for each q, find the
    * bin containing rank ⌈q·N⌉ on the cumulative counts and linearly
    * interpolate inside it. The sketch is bins-sized (broadcast); the
    * cumulative window runs over ≤ `bins` rows, never the data. Error
    * is bounded by one bin width — tune `bins` to the tolerance.
    */
  def histogramQuantiles(
      sketch: DataFrame, qs: Seq[Double], lo: Double, hi: Double, bins: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val width = (hi - lo) / bins
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    qs.toDF("q")
      .join(broadcast(cum),
        col("cum") >= greatest(lit(1L), ceil(col("q") * col("n"))) &&
        col("cum_before") < greatest(lit(1L), ceil(col("q") * col("n"))))
      .groupBy("q")
      .agg(min(struct(col("bin"), col("cnt"), col("cum_before"), col("n")))
        .as("b"))
      .select(col("q"),
        (lit(lo) + lit(width) * (col("b.bin") +
          (greatest(lit(1L), ceil(col("q") * col("b.n"))) - col("b.cum_before"))
            .cast("double") / col("b.cnt"))).as("estimate"))
  }

  /** Point-estimate the frequency of each probe value against a CMS table:
    * min over the `depth` rows of the matching bucket's counter (0 if the
    * bucket is empty). `probes` must expose `valueCol`; the sketch is tiny
    * (≤ depth×width rows) and broadcast.
    */
  def cmsEstimate(
      probes: DataFrame, sketch: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024
  ): DataFrame = {
    val melted = probes.select(col("*"),
      posexplode(array((0 until depth).map(r =>
        cmsBucket(col(valueCol), r, width)): _*)).as(Seq("row", "bucket")))
    melted
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(probes.columns.map(col).toSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))
  }

  /** Bloom probe position for `value` under probe index `probe`: the
    * first eight hex digits of md5("bloom:probe:value") mod `mBits`.
    * md5-derived like [[cmsBucket]] and the LSH hyperplane family, so a
    * second engine rebuilds the identical filter bit-for-bit.
    */
  def bloomBit(value: Column, probe: Int, mBits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"bloom:$probe:"), value)), 1, 8), 16, 10)
      .cast("long"), lit(mBits.toLong))

  /** Distributed Bloom filter over `of`'s values, as the relational
    * SET-OF-SET-BITS (`bit` BIGINT, ≤ mBits rows, typically far fewer) —
    * the fourth mergeable-sketch family next to HLL (distincts), CMS
    * (frequencies) and histograms (quantiles), covering MEMBERSHIP: "was
    * this content hash ever admitted?" without joining the full corpus.
    *
    * Mergeability is set UNION of the bits tables (dedup on `bit`) —
    * per-shard/per-day filters roll up into a corpus filter without
    * re-reading data, and the union is exactly the filter of the unioned
    * key sets (Bloom OR). Build cost: one k×N explode into a groupBy
    * with map-side partials; the result is bounded by mBits rows no
    * matter the corpus size, so the probe side can broadcast it. No
    * false negatives ever; false-positive rate ≈ (1-e^(-kN/m))^k, the
    * textbook bound, and — because the probes are pure md5 arithmetic —
    * which specific keys collide is deterministic and replayable.
    *
    * (Spark's own `stat.bloomFilter` builds a driver-side object; this
    * formulation stays distributed, mergeable and SQL-replayable, at the
    * cost of ~8 bytes per SET bit — the right trade for screens up to
    * ~10⁸ bits. Beyond that, pack bits into fixed-width word groups via
    * `bit div 64` + `sum(1L << (bit % 64))` on the same probe family.)
    */
  def bloomBits(
      df: DataFrame, of: Column, k: Int = 7, mBits: Int = 65536
  ): DataFrame =
    df.select(explode(array((0 until k).map(p =>
        bloomBit(of, p, mBits)): _*)).as("bit"))
      .distinct()

  /** The word-packed Bloom build — the 10⁸+-bit scale path the
    * relational [[bloomBits]] documents: the same md5 probe family, but
    * bits pack 64-per-row into `(word, bits)` via a `bit_or` aggregate,
    * so a 10⁹-bit filter is ~16M rows / ~250 MB instead of ~10⁹ rows.
    * Merge is `bit_or` by word (still exactly Bloom OR); [[packWords]]
    * converts a relational bits table to this form, and the two builds
    * are bit-identical (asserted in SketchesSpec).
    */
  def bloomWordsBits(
      df: DataFrame, of: Column, k: Int = 7, mBits: Int = 65536
  ): DataFrame =
    packWords(df.select(explode(array((0 until k).map(p =>
        bloomBit(of, p, mBits)): _*)).as("bit")))

  /** Pack a relational `bit` table into 64-bit words: (word, bits). */
  def packWords(bits: DataFrame): DataFrame =
    bits.distinct()
      .select(expr("bit div 64").as("word"),
        expr("shiftleft(1L, cast(bit % 64 AS int))").as("_m"))
      .groupBy("word")
      .agg(expr("bit_or(_m)").as("bits"))

  /** [[bloomScreen]] over the word-packed form: probes join on their
    * word and test their mask bit; the all-k fold is unchanged. Same
    * broadcast shape — the packed table is 64× smaller.
    */
  def bloomScreenWords(
      df: DataFrame, keyCol: String, value: Column, words: DataFrame,
      k: Int = 7, mBits: Int = 65536, flag: String = "might_contain"
  ): DataFrame = {
    val probes = df.select(col(keyCol).as("_bk"),
      explode(array((0 until k).map(p => bloomBit(value, p, mBits)): _*))
        .as("bit"))
      .select(col("_bk"), expr("bit div 64").as("word"),
        expr("shiftleft(1L, cast(bit % 64 AS int))").as("_m"))
    val hits = probes
      .join(broadcast(words), Seq("word"), "left")
      .groupBy("_bk")
      .agg((sum(when(col("bits").isNotNull &&
        (col("bits").bitwiseAND(col("_m")) === col("_m")), 1L)
        .otherwise(0L)) === k).as(flag))
    df.join(hits, df(keyCol) === hits("_bk")).drop("_bk")
  }

  /** Screen `df` against a Bloom bits table: appends `might_contain` —
    * true iff ALL k probe positions of `value` are set. One k-way
    * explode joined against the broadcast bits table (left join + count
    * of matches = k; duplicate probe positions match independently, so
    * the count test is exact), then one groupBy on `keyCol` to fold the
    * verdict and an equi-join back onto the input rows.
    *
    * The intended 100 TB shape: build [[bloomBits]] once over admitted
    * history (bounded output), broadcast it against each fresh shard,
    * and let `might_contain = false` — the overwhelming majority —
    * skip the exact-membership join entirely; only flagged rows pay it.
    */
  def bloomScreen(
      df: DataFrame, keyCol: String, value: Column, bits: DataFrame,
      k: Int = 7, mBits: Int = 65536, flag: String = "might_contain"
  ): DataFrame = {
    val probes = df.select(col(keyCol).as("_bk"),
      explode(array((0 until k).map(p => bloomBit(value, p, mBits)): _*))
        .as("bit"))
    val hits = probes
      .join(broadcast(bits.withColumn("_set", lit(1))), Seq("bit"), "left")
      .groupBy("_bk")
      .agg((count(col("_set")) === k).as(flag))
    df.join(hits, df(keyCol) === hits("_bk")).drop("_bk")
  }

  /** Misra–Gries summary REDUCTION (Misra & Gries 1982, the batch-wise
    * mergeable form of Agarwal et al. 2012 "Mergeable Summaries"): given
    * an exact count table, keep at most `k` counters by subtracting the
    * (k+1)-st largest count value from every counter and dropping the
    * non-positive — the set-of-counters analogue of decrementing all
    * counters when a new item finds them full. Deterministic: the
    * subtracted value is selected via the injective (count desc, key)
    * order, so both engines replay the summary bit-for-bit.
    *
    * Guarantee (the MG invariant, preserved under [[mgMerge]]): stored
    * counts never overcount, and undercount ≤ total decrement ≤
    * n/(k+1) over the n items summarized — so any key with true
    * frequency > n/(k+1) is GUARANTEED present. That is the whole
    * point at 100 TB: the summary is k rows however large the key
    * domain, and the candidate selection is a partial top-(k+1)
    * (TakeOrderedAndProject — per-partition top-k merged once), never
    * a key-domain sort.
    */
  def mgSubtract(counts: DataFrame, k: Int, keyCol: String = "key",
      cntCol: String = "c"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val d = counts.orderBy(col(cntCol).desc, col(keyCol)).limit(k + 1)
      .agg(when(count(lit(1)) > k, min(col(cntCol)))
        .otherwise(lit(0L)).as("_d"))
    counts.crossJoin(broadcast(d)) // 1-row reduction value
      .withColumn(cntCol, col(cntCol) - col("_d"))
      .filter(col(cntCol) > 0).drop("_d")
  }

  /** Merge a stored k-bounded Misra–Gries summary with a fresh batch's
    * exact counts: counter-wise sum, then one [[mgSubtract]] reduction.
    * Associative in the mergeable-summaries sense (the ERROR BOUND
    * composes: undercount after any merge tree ≤ n_total/(k+1)); the
    * exact counter values depend on merge order, which is why the
    * streaming wrapper fixes batch order and the oracle replays the
    * same chain. Cost per merge: the batch count pass + a top-(k+1)
    * selection — history is NEVER recounted.
    */
  def mgMerge(prev: DataFrame, batchCounts: DataFrame, k: Int,
      keyCol: String = "key", cntCol: String = "c"): DataFrame =
    mgSubtract(
      prev.unionByName(batchCounts)
        .groupBy(keyCol).agg(sum(col(cntCol)).as(cntCol)),
      k, keyCol, cntCol)

  /** One-shot Misra–Gries over a frame: exact count pass (map-side
    * combinable) + one reduction. */
  def mgSummary(df: DataFrame, key: Column, k: Int,
      keyCol: String = "key"): DataFrame =
    mgSubtract(
      df.select(key.as(keyCol)).groupBy(keyCol)
        .agg(count(lit(1)).as("c")),
      k, keyCol, "c")
}
