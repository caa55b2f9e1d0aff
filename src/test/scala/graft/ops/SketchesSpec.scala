package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf("0.01")}/documents.parquet")
  private lazy val sh = Dedup.shingles(docs)

  test("sketch estimates track exact distinct counts within HLL error bounds") {
    val exact = sh.groupBy("doc_id").agg(countDistinct("w").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(sh, col("w"), Seq(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (id, est) =>
      val n = exact(id).toDouble
      // lgK=12 → RSE ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma + small-n slack
      assert(math.abs(est - n) <= math.max(3.0, n * 0.08),
        s"doc $id: est $est vs exact $n")
    }
  }

  test("merged per-source sketches estimate the corpus like a direct sketch") {
    // sketch per source (the daily-shard pattern), merge, estimate —
    // must equal sketching the whole corpus directly: merge is lossless
    val perSource = Sketches.distinctSketch(
      graft.queries.DedupShared.shingles(docs, col("source")),
      col("w"), Seq(col("source")))
    val merged = Sketches.mergeSketches(
      perSource.withColumn("all", lit(1)), Seq(col("all")))
      .select(Sketches.estimate(col("sketch")).as("est"))
      .head().getLong(0)
    val direct = Sketches.distinctSketch(
      sh.withColumn("all", lit(1)), col("w"), Seq(col("all")))
      .select(Sketches.estimate(col("sketch")).as("est"))
      .head().getLong(0)
    // the union gadget's registers can differ slightly from a
    // directly-built sketch (DataSketches HLL union targets HLL_8), so
    // the contract is estimate-closeness, not bit-equality
    assert(math.abs(merged - direct) <= direct * 0.02,
      s"merged $merged vs direct $direct")
    // and both track the exact corpus vocabulary
    val exact = sh.select(countDistinct("w")).head().getLong(0)
    assert(math.abs(merged - exact) <= exact * 0.08,
      s"merged $merged vs exact $exact")
    assert(math.abs(direct - exact) <= exact * 0.08,
      s"direct $direct vs exact $exact")
  }

  test("count-min estimates are one-sided and exact on a collision-free vocab") {
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val sketch = Sketches.countMinSketch(toks, col("tok"))
    // sketch is bounded: at most depth×width counters, total mass = depth×N
    assert(sketch.count() <= 4 * 1024)
    val n = toks.count()
    val mass = sketch.groupBy("row").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1))
    assert(mass.length == 4 && mass.forall(_ == n))
    val est = Sketches.cmsEstimate(exact, sketch, "tok").collect()
    est.foreach { r =>
      val (ex, cms) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"))
      assert(cms >= ex, s"${r.get(0)}: cms $cms < exact $ex (CMS never underestimates)")
    }
    // this corpus's vocab ≪ width, so collisions are rare: the estimates
    // must be exact for the overwhelming majority
    val exactHits = est.count(r => r.getAs[Long]("cms_n") == r.getAs[Long]("exact_n"))
    assert(exactHits >= est.length * 0.9, s"$exactHits/${est.length} exact")
  }

  test("cmsJoinSize: one-sided, exact on a collision-free key domain, " +
    "and merge-composable") {
    import spark.implicits._
    // 50 keys, key i appears i+1 times in A and twice in B:
    // true join size = Σ (i+1)·2 = 2·(50·51/2) = 2550; 50 keys in a
    // 65536-bucket row collide with probability ~2%, so demand exactness
    val a = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("k")
    val b = (0 until 50).flatMap(i => Seq.fill(2)(s"k$i")).toDF("k")
    def cms(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinSketch(df, col("k"), depth = 4, width = 65536)
    val est = Sketches.cmsJoinSize(cms(a), cms(b)).collect()(0)
    assert(est.getAs[Long]("depth") == 4L)
    assert(est.getAs[Long]("join_size_est") == 2550L,
      s"collision-free estimate must be exact: ${est.toString}")

    // one-sided: a deliberately tiny width forces collisions UP, never down
    val estTiny = Sketches.cmsJoinSize(
      Sketches.countMinSketch(a, col("k"), depth = 4, width = 8),
      Sketches.countMinSketch(b, col("k"), depth = 4, width = 8))
      .collect()(0).getAs[Long]("join_size_est")
    assert(estTiny >= 2550L, s"CM inner product must overestimate: $estTiny")

    // mergeability: sketches of two halves of A, counter-summed, give
    // the identical estimate to sketching A directly
    val (a1, a2) = (a.filter(length(col("k")) <= 2),
      a.filter(length(col("k")) > 2))
    val merged = Sketches.mergeCountMin(cms(a1).unionByName(cms(a2)))
    val estMerged = Sketches.cmsJoinSize(merged, cms(b))
      .collect()(0).getAs[Long]("join_size_est")
    assert(estMerged == 2550L)
  }

  test("streaming count-min accumulation equals the batch sketch exactly") {
    // the incremental-accounting contract: per-micro-batch sketches merged
    // into a running table must equal sketching the whole stream at once
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    var acc = Seq.empty[(Int, Long, Long)].toDF("row", "bucket", "cnt")
    val q = input.toDF().toDF("tok").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acc = Sketches.mergeCountMin(
          acc.union(Sketches.countMinSketch(batch, col("tok"))))
          .localCheckpoint(true) // truncate lineage across batches
        ()
      }.start()
    try {
      input.addData("alpha", "beta", "alpha")
      q.processAllAvailable()
      input.addData("beta", "gamma", "alpha")
      q.processAllAvailable()
    } finally q.stop()
    val direct = Sketches.countMinSketch(
      Seq("alpha", "beta", "alpha", "beta", "gamma", "alpha").toDF("tok"),
      col("tok"))
    assert(acc.except(direct).isEmpty && direct.except(acc).isEmpty)
    val est = Sketches.cmsEstimate(
      Seq("alpha", "beta", "gamma", "absent").toDF("tok"), acc, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 3 && est("beta") >= 2 && est("gamma") >= 1)
    assert(est("absent") == 0) // empty buckets floor the min at zero
  }

  test("count-min merge: per-source sketches sum to the corpus sketch exactly") {
    val toks = docs.select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val shards = toks.select("source").distinct().collect().map(_.getString(0))
      .map(src => Sketches.countMinSketch(toks.filter(col("source") === src), col("tok")))
    val merged = Sketches.mergeCountMin(shards.reduce(_ union _))
    val direct = Sketches.countMinSketch(toks, col("tok"))
    // CMS merge is exact counter addition — bit-equal tables, unlike HLL
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("streaming histogram accumulation equals the batch sketch exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    var acc = Seq.empty[(Int, Long)].toDF("bin", "cnt")
    val q = input.toDF().toDF("v").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acc = Sketches.mergeHistograms(
          acc.union(Sketches.histogramSketch(batch, col("v"), 0.0, 100.0, 10)))
          .localCheckpoint(true)
        ()
      }.start()
    try {
      input.addData(5.0, 15.0, 15.5)
      q.processAllAvailable()
      input.addData(95.0, 200.0, -3.0) // incl. out-of-domain clamps
      q.processAllAvailable()
    } finally q.stop()
    val direct = Sketches.histogramSketch(
      Seq(5.0, 15.0, 15.5, 95.0, 200.0, -3.0).toDF("v"),
      col("v"), 0.0, 100.0, 10)
    assert(acc.except(direct).isEmpty && direct.except(acc).isEmpty)
  }

  test("histogram quantiles: within one bin width of exact, merge is exact") {
    import spark.implicits._
    val vals = docs.select(col("n_chars").cast("double").as("v"))
    val (lo, hi, bins) = (0.0, 600.0, 60)
    val direct = Sketches.histogramSketch(vals, col("v"), lo, hi, bins)
    // shard by parity, merge — must equal the direct sketch bit-for-bit
    val shards = Seq(0, 1).map(p =>
      Sketches.histogramSketch(
        docs.filter(col("doc_id") % 2 === p)
          .select(col("n_chars").cast("double").as("v")),
        col("v"), lo, hi, bins))
    val merged = Sketches.mergeHistograms(shards.reduce(_ unionByName _))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
    val qs = Seq(0.1, 0.5, 0.9)
    val est = Sketches.histogramQuantiles(direct, qs, lo, hi, bins)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = docs.stat.approxQuantile("n_chars", qs.toArray, 0.0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= (hi - lo) / bins + 1e-9,
        s"q=$q: est ${est(q)} vs exact $ex")
    }
    // out-of-domain values clamp into edge bins instead of vanishing
    val clamped = Sketches.histogramSketch(
      Seq(-5.0, 1e9).toDF("v"), col("v"), lo, hi, bins)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(clamped == Map(0 -> 1L, (bins - 1) -> 1L))
  }

  test("sketchOverlap: inclusion-exclusion tracks exact vocab overlap") {
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val toks = docs
      .withColumn("_t", TextAnalysis.tokens(col("text")))
      .select(col("source").as("key"), explode(col("_t")).as("tok"))
    val sketches = Sketches.distinctSketch(toks, col("tok"), Seq(col("key")))
    val est = Sketches.sketchOverlap(sketches).collect()
      .map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) ->
        (r.getAs[Long]("est_a"), r.getAs[Long]("est_b"),
          r.getAs[Long]("est_common"))).toMap
    // exact twin (the q_text_vocab_overlap formulation, all sources)
    val vocab = toks.distinct()
    val exact = vocab.as("a")
      .join(vocab.as("b"),
        col("a.tok") === col("b.tok") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("ka"), col("b.key").as("kb"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.nonEmpty, "fixture must produce overlapping pairs")
    exact.foreach { case (pair, n) =>
      val (_, _, estCommon) = est(pair)
      // lgK=12 on few-hundred-element sets: near-exact; allow 5% + 2 abs
      assert(math.abs(estCommon - n) <= math.max(2L, (n * 0.05).toLong),
        s"$pair: est $estCommon vs exact $n")
    }
  }

  test("bloom screen: zero false negatives, bounded false positives, union merge") {
    import spark.implicits._
    val hist = (1 to 200).map(i => s"member-$i").toDF("key")
    val bits = Sketches.bloomBits(hist, col("key"), k = 7, mBits = 65536)
    // members ∪ strangers probed together; every member MUST flag true
    val probesDf = ((1 to 200).map(i => s"member-$i") ++
      (1 to 400).map(i => s"stranger-$i")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "key")
    val flags = Sketches.bloomScreen(probesDf, "id", col("key"), bits)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Boolean]("might_contain"))
    val (members, strangers) = flags.partition(_._1.startsWith("member"))
    assert(members.forall(_._2), "bloom false negative — structurally impossible")
    // fp bound: load kN/m = 7*200/65536 → (1-e^-0.021)^7 ≈ 1e-12; any
    // stranger flagged would be a probe-arithmetic bug, not bad luck
    assert(strangers.count(_._2) == 0,
      s"unexpected false positives: ${strangers.filter(_._2).map(_._1).toSeq}")

    // merge = set union of bits tables: screening against union(bitsA, bitsB)
    // equals screening against bits of (A ∪ B) — Bloom OR, lossless
    val a = (1 to 50).map(i => s"a-$i").toDF("key")
    val b = (1 to 50).map(i => s"b-$i").toDF("key")
    val unionOfBits = Sketches.bloomBits(a, col("key"))
      .union(Sketches.bloomBits(b, col("key"))).distinct()
    val bitsOfUnion = Sketches.bloomBits(a.union(b), col("key"))
    assert(unionOfBits.except(bitsOfUnion).isEmpty &&
      bitsOfUnion.except(unionOfBits).isEmpty)

    // the word-packed scale form is bit-identical to the relational one
    // and screens to the same verdicts
    val packed = Sketches.packWords(bits)
    val direct = Sketches.bloomWordsBits(hist, col("key"))
    assert(packed.except(direct).isEmpty && direct.except(packed).isEmpty)
    val packedFlags =
      Sketches.bloomScreenWords(probesDf, "id", col("key"), direct)
        .collect()
        .map(r => r.getAs[String]("key") -> r.getAs[Boolean]("might_contain"))
        .toMap
    assert(flags.toMap == packedFlags)
  }

  test("rollingDistinct: RANGE frame honors bucket gaps; estimates track exact") {
    import spark.implicits._
    // hours 0..5 densely populated, then a gap, then hour 40 alone
    val rows = (for {
      h <- 0L to 5L
      u <- 0L until 50L + h * 10L
    } yield (h, s"u${u + h * 7L}")) ++ (0L until 30L).map(i => (40L, s"g$i"))
    val df = rows.toDF("h", "user")
    val got = Sketches.rollingDistinct(df, "h", col("user"), window = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap

    val byHour = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def exact(wend: Long): Int =
      (wend - 3 to wend).flatMap(byHour.get).flatten.toSet.size
    (0L to 5L).foreach { h =>
      val e = exact(h)
      assert(math.abs(got(h) - e) <= math.max(2.0, 0.05 * e),
        s"hour $h: est ${got(h)} vs exact $e")
    }
    // hour 40: the trailing RANGE covers 37..40 — only hour 40 exists.
    // A ROWS frame would wrongly reach back to the dense prefix.
    assert(math.abs(got(40L) - 30.0) <= 2.0, s"gap window: ${got(40L)}")
  }

  test("Misra-Gries: hand reduction and merge values, never overcounts, " +
    "and the n/(k+1) undercount guarantee keeps a planted heavy key") {
    import spark.implicits._
    def m(rows: Seq[(String, Long)]) = rows.toDF("key", "c")
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("c")).toMap

    // k=2, counts {a:5,b:4,c:3,d:1}: 3rd largest = 3 → {a:2, b:1}
    val s0 = Sketches.mgSubtract(m(Seq("a" -> 5L, "b" -> 4L, "c" -> 3L,
      "d" -> 1L)), k = 2)
    assert(got(s0) == Map("a" -> 2L, "b" -> 1L))
    // at most k counters even with ties at the boundary
    val tied = Sketches.mgSubtract(m(Seq("a" -> 3L, "b" -> 3L, "c" -> 3L)),
      k = 2)
    assert(got(tied).isEmpty, "all counters tie the (k+1)-st → all drop")
    // ≤ k distinct keys: identity (d = 0)
    assert(got(Sketches.mgSubtract(m(Seq("a" -> 5L, "b" -> 1L)), k = 2)) ==
      Map("a" -> 5L, "b" -> 1L))

    // merge: {a:2,b:1} + {c:4,a:1} → sums {a:3,c:4,b:1}, d=1 → {a:2,c:3}
    val merged = Sketches.mgMerge(s0, m(Seq("c" -> 4L, "a" -> 1L)), k = 2)
    assert(got(merged) == Map("a" -> 2L, "c" -> 3L))

    // guarantee: 60 copies of HOT + 40 singletons-ish, k=4 → any key with
    // freq > 100/5 = 20 must survive; counts are never above exact
    val items = (Seq.fill(60)("HOT") ++
      (0 until 40).map(i => s"cold${i % 20}")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
      .toDF("i", "key")
    val summ = got(Sketches.mgSummary(items, col("key"), k = 4))
    assert(summ.contains("HOT"), s"heavy key lost: $summ")
    assert(summ("HOT") <= 60L && summ("HOT") >= 60L - 100L / 5L,
      s"undercount bound violated: ${summ("HOT")}")
    assert(summ.size <= 4)
  }

  test("Misra-Gries property sweep: over random Zipf-ish streams and " +
    "random batch splits, the merged summary never overcounts, every " +
    "key undercounts by <= n/(k+1), and every > n/(k+1) key survives") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 6) {
      val k = 3 + rnd.nextInt(8)
      val nKeys = 5 + rnd.nextInt(40)
      // Zipf-ish frequencies: key j gets ~ n / (j+1) copies
      val items = (0 until nKeys).flatMap { j =>
        Seq.fill(1 + 200 / (j + 1))(s"t${trial}_k$j")
      }
      val n = items.size.toLong
      val exact = items.groupBy(identity).map { case (s, l) =>
        s -> l.size.toLong }
      // random batch split into 2..5 batches, folded in order
      val nb = 2 + rnd.nextInt(4)
      val batches = items.zipWithIndex
        .groupBy { case (_, i) => i % nb }.toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val first = Sketches.mgSubtract(
        batches.head.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("i", "key").groupBy("key").agg(count(lit(1)).as("c")),
        k)
      val summary = batches.tail.foldLeft(first) { (prev, b) =>
        Sketches.mgMerge(prev,
          b.zipWithIndex.map { case (s, i) => (i.toLong, s) }
            .toDF("i", "key").groupBy("key").agg(count(lit(1)).as("c")),
          k)
      }.collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("c"))
        .toMap
      val bound = n / (k + 1)
      assert(summary.size <= k, s"trial $trial: ${summary.size} > k=$k")
      summary.foreach { case (key, c) =>
        assert(c <= exact(key), s"trial $trial: $key overcounts")
        assert(exact(key) - c <= bound,
          s"trial $trial: $key undercounts past n/(k+1)=$bound")
      }
      exact.filter(_._2 > bound).keys.foreach { h =>
        assert(summary.contains(h),
          s"trial $trial: heavy $h (${exact(h)} > $bound) lost, k=$k")
      }
    }
  }
}
