package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Behavioral specs for model-guided data selection; the battery oracle
  * (q_text_dsir_select) checks engine-exactness, these check semantics
  * on hand-built fixtures.
  */
class DataSelectSpec extends AnyFunSuite with SparkTestBase {

  test("dsirWeights: target-vocabulary docs outscore off-domain docs") {
    import spark.implicits._
    // target domain speaks {alpha beta gamma}; off-domain {zeta eta theta}.
    // doc 5 is unseen but target-like, doc 6 unseen off-domain-like.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma", true),
      (3L, "zeta eta theta zeta", false),
      (4L, "eta theta zeta eta theta", false),
      (5L, "alpha beta gamma beta", false),
      (6L, "zeta eta theta eta", false)
    ).toDF("doc_id", "text", "tgt")
    val w = DataSelect.dsirWeights(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 6)
    // the unseen target-like doc must rank above the unseen off-domain one
    assert(w(5L) > w(6L),
      s"target-like doc should outscore off-domain: ${w(5L)} vs ${w(6L)}")
    // and the in-target docs sit at the top, off-domain at the bottom
    assert(Seq(w(1L), w(2L)).min > Seq(w(3L), w(4L)).max)
  }

  test("dsirWeights: score is a pure integer sum — repartition-invariant") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"tok$i shared common shared tok${i % 7}", i % 3 == 0))
      .toDF("doc_id", "text", "tgt")
    val a = DataSelect.dsirWeights(docs, col("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = DataSelect.dsirWeights(docs.repartition(13), col("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("logisticTrace: converges to 100% on a separable label") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i / 200.0, i > 100)).toDF("x", "y")
    val trace = DataSelect.logisticTrace(rows, col("y"), Seq(col("x")),
      iters = 30, lrate = 12.0)
    assert(trace.size == 30)
    assert(trace.last.nCorrect >= 190,
      s"separable problem should be ~solved: ${trace.last.nCorrect}/200")
    assert(trace.last.nCorrect > trace.head.nCorrect)
    // the feature weight must end up positive (y rises with x) and the
    // bias negative (the boundary sits at x≈0.5, so z(0) < 0)
    assert(trace.last.weights(1) > 0.0 && trace.last.weights(0) < 0.0)
  }

  test("logisticTrace: quantized gradients make the trace partition-stable") {
    import spark.implicits._
    val rows = (1 to 120).map(i =>
      (i % 10 / 10.0, (i % 13) / 13.0, i % 3 == 0)).toDF("x1", "x2", "y")
    val t1 = DataSelect.logisticTrace(rows, col("y"),
      Seq(col("x1"), col("x2")), iters = 5)
    val t2 = DataSelect.logisticTrace(rows.repartition(17), col("y"),
      Seq(col("x1"), col("x2")), iters = 5)
    assert(t1.map(s => (s.step, s.weights, s.nCorrect)) ==
      t2.map(s => (s.step, s.weights, s.nCorrect)))
  }

  test("lmScore: common-prefix/unseen-continuation bigrams score as most " +
      "surprising; in-domain text as least") {
    import spark.implicits._
    val docs = Seq(
      // train: a tight phrase distribution
      (1L, "big data joins big data scans big data joins", true),
      (2L, "big data scans big data joins big data scans", true),
      // in-domain probe: only seen bigrams
      (3L, "big data joins big data scans", false),
      // surprise probe: 'big' never continues with 'zz'
      (4L, "big zz big zz big zz", false),
      // fully OOV probe: unseen prefixes (milder surprise than doc 4 —
      // an unseen PREFIX backs off to 1/V, a betrayed common prefix
      // pays 1/(c(w1)+V))
      (5L, "qq ww qq ww qq ww", false)
    ).toDF("doc_id", "text", "train")
    val out = DataSelect.lmScore(docs, col("train"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("nll_per_tok_bp"))
      .toMap
    assert(out.size == 5)
    assert(out(3L) < out(5L) && out(5L) < out(4L),
      s"expected in-domain < OOV-prefix < betrayed-prefix: $out")
    // scoring is train-table-driven: the train docs themselves score low
    assert(out(1L) < out(5L) && out(2L) < out(5L))
  }

  test("doremiMix: weight mass flows monotonically toward the lossy domain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // pseudoExp tracks exp within 0.2% on the working range
    for (x <- Seq(0.0, 0.1, 0.5, 1.0))
      assert(math.abs(DataSelect.pseudoExp(x) - math.exp(x))
        <= 0.002 * math.exp(x), s"pseudoExp($x)")
    val docs = Seq.tabulate(300) { i =>
      val dom = Seq("hard", "mid", "easy")(i % 3)
      val loss = dom match {
        case "hard" => 6000L; case "mid" => 3000L; case _ => 500L
      }
      (i.toLong, dom, loss)
    }.toDF("doc_id", "source", "loss")
    def weights(iters: Int): Map[String, Long] =
      DataSelect.doremiMix(docs, "source", col("loss"), iters = iters)
        .collect()
        .map(r => r.getAs[String]("domain") -> r.getAs[Long]("weight_micro"))
        .toMap
    val w0 = weights(0); val w2 = weights(2); val w4 = weights(4)
    assert(w0.values.toSet == Set(1000000L / 3)) // uniform start
    // each extra round moves mass hard-ward, never past full mass
    assert(w2("hard") > w0("hard") && w4("hard") > w2("hard"))
    assert(w4("easy") < w2("easy") && w2("easy") < w0("easy"))
    assert(w4("hard") > w4("mid") && w4("mid") > w4("easy"))
    Seq(w2, w4).foreach(w => assert(w.values.sum <= 1000000L &&
      w.values.sum > 999990L, s"floor-normalized mass: ${w.values.sum}"))
  }

  test("lmScoreKN: seen text scores far below gibberish, and the " +
    "continuation backoff prefers broad-context words (the Francisco " +
    "effect add-1 cannot express)") {
    import spark.implicits._
    // 'common' follows 5 DIFFERENT contexts; 'francisco' appears the
    // same total count but only ever after 'san'
    val train = Seq(
      (1L, "a common b common c common d common e common", true),
      (2L, "san francisco san francisco san francisco san francisco " +
        "san francisco", true),
      // eval docs: identical unseen context 'zz' — only the
      // continuation distribution can separate them
      (10L, "zz common", false),
      (11L, "zz francisco", false),
      (12L, "a common b common", false), // fully in-distribution
      (13L, "qq ww ee rr", false) // fully out-of-distribution
    ).toDF("doc_id", "text", "tr")
    val out = DataSelect.lmScoreKN(train.toDF(), col("tr")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def nll(id: Long) = out(id).getAs[Long]("nll_per_tok_millibits")
    assert(out.values.forall(_.getAs[Long]("nll_fix") >= 0L))
    // in-distribution text scores far below gibberish
    assert(nll(12L) < nll(13L),
      s"seen ${nll(12L)} must beat unseen ${nll(13L)}")
    // the KN signature: same context novelty, but 'common' has 5
    // distinct continuation contexts vs francisco's 1 → lower NLL
    assert(nll(10L) < nll(11L),
      s"broad-continuation word must win backoff: ${nll(10L)} vs ${nll(11L)}")
  }

  test("mixAudit: matched strata at zero deviation, ghost and undeclared " +
    "strata surface as findings") {
    import spark.implicits._
    val docs = (Seq.fill(50)("web") ++ Seq.fill(30)("code") ++
      Seq.fill(20)("forum")).toDF("stratum")
    val quotas = Seq(("web", 5000L), ("code", 2000L), ("books", 3000L))
      .toDF("stratum", "q_bp")
    val out = DataSelect.mixAudit(docs, quotas).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    // web hits its quota exactly → dev 0, zero χ² contribution
    assert(out("web").getAs[Long]("p_bp") == 5000L &&
      out("web").getAs[Long]("dev_bp") == 0L &&
      out("web").getAs[Long]("chi2_term_e4") == 0L)
    // code is 10 points over: term = 1000²/2000 = 500
    assert(out("code").getAs[Long]("dev_bp") == 1000L &&
      out("code").getAs[Long]("chi2_term_e4") == 500L)
    // declared but absent: present with 0 docs and full negative dev
    assert(out("books").getAs[Long]("n_docs") == 0L &&
      out("books").getAs[Long]("dev_bp") == -3000L)
    // present but undeclared: a finding, not an arithmetic input
    assert(out("forum").isNullAt(out("forum").fieldIndex("q_bp")) &&
      out("forum").isNullAt(out("forum").fieldIndex("chi2_term_e4")) &&
      out("forum").getAs[Long]("dev_bp") == 2000L)
  }

  test("rendezvousShard: minimal disruption — growing 8 → 12 shards moves " +
    "docs only INTO new shards, at roughly the (m-n)/m rate") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    val out = DataSelect.rendezvousShard(
      DataSelect.rendezvousShard(docs, 8, out = "s8"), 12, out = "s12")
      .collect()
    // THE rendezvous theorem: a doc's weight on shards 0..7 is unchanged
    // by adding shards 8..11, so its argmax either stays put or lands in
    // a NEW shard — never relocates between old shards.
    out.foreach { r =>
      val (s8, s12) = (r.getAs[Long]("s8"), r.getAs[Long]("s12"))
      assert(s12 == s8 || s12 >= 8L,
        s"doc moved between OLD shards: $s8 -> $s12")
    }
    val moved = out.count(r => r.getAs[Long]("s8") != r.getAs[Long]("s12"))
    assert(moved > 400 / 6 && moved < 400 / 2,
      s"moved fraction implausible for (12-8)/12: $moved/400")
    assert(out.map(_.getAs[Long]("s12")).distinct.length == 12)
    assert(out.map(_.getAs[Long]("s8")).forall(s => s >= 0 && s < 8))
  }

  test("epochShuffle: reproducible per epoch, reshuffled across epochs, " +
      "shard-concatenation equals the global key sort") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "source")
    def perm(ep: Int, df: org.apache.spark.sql.DataFrame = rows) =
      DataSelect.epochShuffle(df, epoch = ep, nShards = 8)
        .select("doc_id", "shard", "pos", "order_key")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val p1 = perm(1)
    // pure function of (epoch, id): partitioning must not change anything
    assert(p1 == perm(1, rows.repartition(7)), "epoch order must be stable")
    // a different epoch is a genuinely different permutation
    val p2 = perm(2)
    val moved = p1.count { case (id, sp) => p2(id) != sp }
    assert(moved > 400, s"epoch 2 must reshuffle, only $moved of 500 moved")
    // concatenating shards in (shard, pos) order IS the global key sort
    val byShard = DataSelect.epochShuffle(rows, epoch = 1, nShards = 8)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val bySort = DataSelect.epochShuffle(rows, epoch = 1, nShards = 8)
      .orderBy("order_key", "doc_id").select("doc_id").as[Long]
      .collect().toSeq
    assert(byShard == bySort, "shards must be contiguous key ranges")
    // pos is a pure function of (epoch, key order): the two-level rank
    // decomposition must be invisible — any subShards value, including
    // the degenerate single-window 1, yields the identical permutation
    val fine = DataSelect.epochShuffle(rows, epoch = 1, nShards = 8,
        subShards = 1024)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val coarse = DataSelect.epochShuffle(rows, epoch = 1, nShards = 8,
        subShards = 1)
      .select("doc_id", "shard", "pos").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fine == p1 && coarse == p1,
      "subShards must not change the permutation")
    // width < subShards (nShards 2^26 → width 64 < the default 256):
    // the clamp makes it work instead of throwing, same permutation law
    val tiny = DataSelect.epochShuffle(rows, epoch = 1, nShards = 1 << 26)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val tinySort = DataSelect.epochShuffle(rows, epoch = 1,
        nShards = 1 << 26, subShards = 1)
      .orderBy("order_key", "doc_id").select("doc_id").as[Long]
      .collect().toSeq
    assert(tiny == tinySort,
      "sub-256 shard widths must clamp, not throw")
  }

  test("stratifiedSample: stateless, so it runs unchanged under streaming " +
      "with batch-identical membership regardless of batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (0L until 300L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val rates = Seq(("a", 3000L), ("b", 7000L)).toDF("source", "rate_bp")
    val expected = DataSelect
      .stratifiedSample(all.toDF("doc_id", "source"), rates)
      .select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = DataSelect
      .stratifiedSample(input.toDF().toDF("doc_id", "source"), rates)
      .writeStream.format("memory").queryName("ss_parity")
      .outputMode("append").start()
    try {
      // uneven batch boundaries must not change membership
      input.addData(all.take(7): _*); q.processAllAvailable()
      input.addData(all.slice(7, 180): _*); q.processAllAvailable()
      input.addData(all.drop(180): _*); q.processAllAvailable()
      val got = spark.table("ss_parity").select("doc_id").as[Long]
        .collect().toSet
      assert(got == expected, "stream and batch must select the same ids")
    } finally q.stop()
  }

  test("stratifiedSample: deterministic, nested across rates, allowlist-gated") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val rates = Seq(("a", 2000L), ("b", 10000L)).toDF("source", "rate_bp")
    val s1 = DataSelect.stratifiedSample(rows, rates)
    val ids1 = s1.select("doc_id").as[Long].collect().toSet
    // rate 10000 keeps every row of its stratum; the hash gate only bites below it
    assert(rows.filter(col("source") === "b").count() ==
      s1.filter(col("source") === "b").count())
    // a-side is a strict subsample
    val aKept = s1.filter(col("source") === "a").count()
    assert(aKept > 0 && aKept < 500, s"a kept $aKept of 500")
    // determinism: same input, same sample — including under repartition
    val ids2 = DataSelect.stratifiedSample(rows.repartition(7), rates)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2, "sample must be a pure function of ids")
    // nesting: raising a stratum rate only ADDS members (threshold sampling),
    // so yesterday's 20% eval set is a subset of today's 50% one
    val wider = DataSelect.stratifiedSample(rows,
      Seq(("a", 5000L), ("b", 10000L)).toDF("source", "rate_bp"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.subsetOf(wider), "rate growth must never evict a member")
    // allowlist: strata with no rate row are dropped entirely
    val gated = DataSelect.stratifiedSample(rows,
      Seq(("a", 10000L)).toDF("source", "rate_bp"))
    assert(gated.filter(col("source") === "b").count() == 0L)
  }
}
