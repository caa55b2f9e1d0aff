package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Behavioral specs for the repetition / top-token-coverage / PII /
  * quantization operators; the battery oracles check engine-exactness,
  * these check the semantics on hand-built fixtures.
  */
class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  test("repetition: alternating boilerplate scores high, unique text zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),      // 2-grams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "v w x y z"),        // all distinct
      (3L, "q")                 // under n → excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, n = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((5L, 2L, 1.0 - 2.0 / 5.0, 3.0 / 5.0)))
    assert(out(2L) == ((4L, 4L, 0.0, 0.25)))
    assert(!out.contains(3L))
  }

  test("top-token coverage: frequent tokens counted, ties broken by token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"),  // x dominates corpus
      (2L, "x z z w")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topTokenCoverage(docs, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // counts: x=4, z=2, y=1, w=1 → top-2 = {x, z}
    assert(out(1L) == ((4L, 3L, 0.75)))  // x x x in top, y not
    assert(out(2L) == ((4L, 3L, 0.75)))  // x z z in top, w not
  }

  test("PII redaction replaces all three classes and leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.org then 192.168.0.1 and +44-207-946-0958 done"),
      (2L, "nothing personal here at all"),
      (3L, "two mails x@y.io and z@w.co plus 10.0.0.1")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextClean.countEmails(col("text")).as("e"),
        TextClean.countIpv4(col("text")).as("i"),
        TextClean.countPhones(col("text")).as("p"),
        TextClean.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "mail <EMAIL> then <IP> and <PHONE> done")
    assert(out(2L) == ((0, 0, 0, "nothing personal here at all")))
    assert(out(3L)._4 == "two mails <EMAIL> and <EMAIL> plus <IP>")
  }

  test("luhn: known-valid PANs pass, off-by-one fails, length gates " +
    "candidates, minted check digits validate") {
    import spark.implicits._
    val df = Seq(
      // 4111111111111111 is the canonical Luhn-valid test PAN
      (1L, "pay 4111111111111111 or 4111111111111112 maybe"),
      (2L, "short 1234 and long 12345678901234567890 are not candidates"),
      (3L, "tab\t5500005555555559\tseparated"), // valid MC test number
      (4L, "nothing numeric here")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        size(TextClean.cardCandidates(col("text"))).as("nc"),
        TextClean.countLuhnCards(col("text")).as("nv"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((2, 1)), "valid counted, off-by-one rejected")
    assert(out(2L) == ((0, 0)), "13-19 digit gate")
    assert(out(3L) == ((1, 1)), "\\s+-adjacent runs are candidates")
    assert(out(4L) == ((0, 0)))
    // minting: check = (10 - luhnSum(payload||'0') mod 10) mod 10 makes
    // every payload validate — the fixture contract q_text_pii_luhn uses
    val minted = spark.range(50)
      .select(lpad((col("id") * 7919L + 123L).cast("string"), 15, "0")
        .as("p"))
      .withColumn("card", concat(col("p"),
        pmod(lit(10) - pmod(TextClean.luhnSum(concat(col("p"), lit("0"))),
          lit(10)), lit(10)).cast("string")))
      .select(TextClean.luhnValid(col("card")).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(minted.forall(identity), "every minted check digit validates")
  }

  test("chao1: hand counts — singleton tail inflates, saturated corpus " +
    "collapses to the observed vocabulary") {
    import spark.implicits._
    // tokens: a:2 b:1 c:1 → V=3 f1=2 f2=1 → chao1 = 3 + 2·1/(2·2) = 3.5
    val out = TextAnalysis.chao1(
      Seq((1L, "a a b c")).toDF("doc_id", "text")).collect()(0)
    assert(out.getAs[Long]("n_tokens") == 4L &&
      out.getAs[Long]("vocab") == 3L &&
      out.getAs[Long]("f1") == 2L && out.getAs[Long]("f2") == 1L &&
      out.getAs[Long]("chao1_x100") == 350L)
    // saturated: every type seen ≥3 times → f1 = 0 → estimate = V
    val sat = TextAnalysis.chao1(
      Seq((1L, "x x x y y y")).toDF("doc_id", "text")).collect()(0)
    assert(sat.getAs[Long]("f1") == 0L &&
      sat.getAs[Long]("chao1_x100") == 200L)
  }

  test("chunking: windows advance by size-overlap, tail kept, reconstruction") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, size = 4, overlap = 1)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6", 1)))
    // every token position is covered by at least one chunk
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered == (0 to 6).map(i => s"t$i").toSet)
  }

  test("packing: bins fill per source in doc order, straddlers go by first token") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("a " * 9).trim, "s1"),  // 9 tokens → bin 0 (cum-before 0)
      (2L, ("b " * 4).trim, "s1"),  // 4 tokens → bin 0 (cum-before 9)
      (3L, ("c " * 5).trim, "s1"),  // 5 tokens → bin 1 (cum-before 13)
      (4L, ("d " * 30).trim, "s2")  // other source packs independently → bin 0
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.pack(docs, binTokens = 10L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((9L, 0L)))
    assert(out(2L) == ((4L, 0L)))
    assert(out(3L) == ((5L, 1L)))
    assert(out(4L) == ((30L, 0L)))
  }

  test("quantized top-k tracks exact brute-force ranking closely") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, emb, k = 5))
    val quant = pairs(Similarity.quantizedTopK(q, emb, k = 5))
    val recall = (exact & quant).size.toDouble / exact.size
    // int8 keeps ~0.8% relative quantization error per component; top-5
    // membership should survive nearly everywhere
    assert(recall >= 0.9, s"quantized recall vs exact too low: $recall")
  }

  test("int8 quantization: codes bounded, reconstruction tight, zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getInt(4), r.getInt(5)))
      .toMap
    val (scale, mse, _, cmin, cmax) = out(1L)
    assert(scale == 127.0 / 2.0)
    assert(cmax <= 127 && cmin >= -128)
    assert(mse < 1e-4, s"reconstruction mse too large: $mse")
    assert(out(2L) == ((0.0, 0.0, 0L, 0, 0)))
  }

  test("BPE training: most frequent pair merges first, ties break lexicographically") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab cd"), (2L, "aaab cd cd")).toDF("doc_id", "text")
    // word freqs: aaab=3, cd=3 → symbolized "a a a b"(3), "c d"(3)
    // round 1 pairs: (a,a)=6, (a,b)=3, (c,d)=3 → merge (a,a), greedy-left
    //   leaves "aa a b" (the overlapping second (a,a) defers)
    // round 2: (aa,a)=3, (a,b)=3, (c,d)=3 → tie → "a b" smallest → "aa ab"
    // round 3: (aa,ab)=3, (c,d)=3 → "aa ab" < "c d" → "aaab"
    val m = TextAnalysis.bpeTrain(docs, 3).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(m(0) == ((1, "a", "a", "aa", 6L)))
    assert(m(1) == ((2, "a", "b", "ab", 3L)))
    assert(m(2) == ((3, "aa", "ab", "aaab", 3L)))
  }

  test("BPE encode: trained merges compress the corpus; counts are exact") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab cd"), (2L, "aaab cd cd")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 3).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // after (a,a)→aa, (a,b)→ab, (aa,ab)→aaab: "aaab" encodes to 1 piece,
    // "cd" stays 2 ("c d" never merged)
    val got = TextAnalysis.bpeEncode(docs, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 1 + 1 + 2L), (2L, 3L, 1 + 2 + 2L)),
      s"got ${got.toSeq}")
    // zero merges = raw character counts
    val raw = TextAnalysis.bpeEncode(docs, Seq.empty).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(raw.toSeq == Seq((1L, 4 + 4 + 2L), (2L, 4 + 2 + 2L)))
  }

  test("normalize: canonical form is idempotent and collapses byte noise") {
    import spark.implicits._
    val cases = Seq(
      "  Hello\t WORLD \r\n",
      "a\u0001b", // control char inside a token becomes a separator
      "already clean",
      "   ", // whitespace-only collapses to empty
      "MiXeD   CaSe\n\nruns")
    val out = cases.toDF("s")
      .select(TextClean.normalize(col("s")).as("n1"))
      .withColumn("n2", TextClean.normalize(col("n1")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (n1, n2) => assert(n1 == n2, s"not idempotent: '$n1'") }
    val norms = out.map(_._1)
    assert(norms(0) == "hello world")
    assert(norms(1) == "a b")
    assert(norms(2) == "already clean")
    assert(norms(3) == "")
    assert(norms(4) == "mixed case runs")
  }

  test("tfidf: rare-but-frequent-in-doc terms outrank ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the quark quark quark"), // quark: tf=3, df=1; the: tf=2, df=3
      (2L, "the lepton"),
      (3L, "the boson boson")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // doc 1: quark score 3·3/1 = 9 beats the 2·3/3 = 2
    assert(out((1L, 1)) == (("quark", 3L, 1L, 9.0)))
    assert(out((1L, 2)) == (("the", 2L, 3L, 2.0)))
    // doc 3: boson 2·3/1 = 6 beats the 1·3/3 = 1
    assert(out((3L, 1))._1 == "boson")
    // ties break alphabetically: doc 2 has lepton (1·3/1=3) then the (1)
    assert(out((2L, 1))._1 == "lepton" && out((2L, 2))._1 == "the")
  }

  test("lmCoverage: common bigrams count as known mass, rare ones don't") {
    import spark.implicits._
    // "a b" appears 3× corpus-wide (docs 1,1,2) → known at minCount=3;
    // every other bigram appears once
    val docs = Seq(
      (1L, "a b c a b"),  // bigrams: ab bc ca ab → 4 mass, ab known (2)
      (2L, "a b"),        // ab → 1 mass, known
      (3L, "x y")         // xy → 1 mass, unknown
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmCoverage(docs, n = 2, minCount = 3L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("weightedSample: ~n per stratum, heavy docs always selected") {
    import spark.implicits._
    val docs = (0L until 100L).map { i =>
      // one giant doc per stratum dominates half the stratum's weight
      val w = if (i % 50 == 0) 5000L else 50L
      (i, s"s${i / 50}", w)
    }.toDF("doc_id", "source", "n_chars")
    val picked = TextAnalysis.weightedSample(docs, n = 10).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val bySource = picked.groupBy(_._2).view.mapValues(_.size).toMap
    // systematic PPS: exactly n boundary crossings per stratum when no
    // doc exceeds one stride... the giant doc spans ~5 strides but is
    // selected once, so totals land in [n/2, n]
    assert(bySource.keySet == Set("s0", "s1"))
    bySource.values.foreach(c => assert(c >= 5 && c <= 10, s"got $bySource"))
    // the giant docs (weight > stride) must be selected
    assert(picked.map(_._1).contains(0L) && picked.map(_._1).contains(50L))
    // determinism: same input → same selection
    val again = TextAnalysis.weightedSample(docs, n = 10).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again == picked)
  }

  test("tokenBudget: greedy prefix on quality rank, not knapsack") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // quality rank: doc 1 (most diverse) > doc 2 > doc 3 (repetitions);
    // tokens 10 / 5 / 4. Budget 14: doc 1 fits (cum 10), doc 2 overflows
    // (cum 15) and doc 3 stays excluded (cum 19) even though its OWN 4
    // tokens would fit — prefix semantics, deterministic
    val docs = Seq(
      (1L, "s0", (1 to 10).map(i => s"alpha$i").mkString(" ")),
      (2L, "s0", "beta1 beta2 beta3 beta4 beta4"),
      (3L, "s0", "gam gam gam gam")
    ).toDF("doc_id", "source", "text")
    val budgets = Seq(("s0", 14L)).toDF("source", "budget_tokens")
    val sel = TextAnalysis.tokenBudget(docs, budgets).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(sel == Set(1L), s"expected prefix {1}, got $sel")
    // raising the budget admits the prefix in rank order
    val sel2 = TextAnalysis.tokenBudget(docs,
      Seq(("s0", 15L)).toDF("source", "budget_tokens")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(sel2 == Set(1L, 2L))
  }

  test("gopherRules: each rule trips on its engineered failure alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val goodWords = ("the of " + (1 to 58).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (1L, goodWords),                                   // passes everything
      (2L, "the of tiny"),                               // word count < 50
      (3L, goodWords + " " + Seq.fill(10)("#").mkString(" ")), // symbol ratio
      (4L, (1 to 60).map(_ => "12345").mkString(" ") + " the of"), // alpha < 80%
      (5L, (1 to 60).map(i => s"word$i").mkString(" ")), // no stopwords
      (6L, (1 to 10).map(_ => "- b").mkString("\n")),    // all-bullet lines
      (7L, goodWords + "\nmore...\nstill...\n"),         // ellipsis lines 2/3
      (8L, "the of " + Seq.fill(58)("a" * 20).mkString(" ")) // mean wl > 10
    ).toDF("doc_id", "text")
    val out = TextClean.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass_gopher"))
    def failsOnly(id: Long, flag: String): Unit = {
      val r = out(id)
      assert(!r.getAs[Boolean](flag), s"doc $id should fail $flag")
      assert(!r.getAs[Boolean]("pass_gopher"))
    }
    failsOnly(2L, "pass_word_count")
    failsOnly(3L, "pass_symbols")
    failsOnly(4L, "pass_alpha")
    failsOnly(5L, "pass_stopwords")
    failsOnly(6L, "pass_bullets")
    failsOnly(7L, "pass_ellipsis")
    failsOnly(8L, "pass_word_shape")
    // the bullet wall also fails alpha ('-' carries no letter) — flags
    // are independent, the conjunction is what gates
    assert(!out(6L).getAs[Boolean]("pass_alpha"))
  }

  test("codeRules: each StarCoder rule trips on its engineered failure alone") {
    import spark.implicits._
    val good = (1 to 20).map(i => s"val x$i = compute(input$i)").mkString("\n")
    val docs = Seq(
      (1L, good),                                // passes everything
      (2L, good + "\n" + "x" * 1001),            // one 1001-char line
      (3L, (1 to 5).map(_ => "a" * 150).mkString("\n")), // avg line 150 > 100
      (4L, (1 to 30).map(_ => "+= -* ;;").mkString("\n") + "\nthe end"), // alnum < 25%
      (5L, good + "\nh = \"" + "deadbeef" * 4 + "\""),   // 32-char hex blob
      (6L, good + "\nb = \"" + "QUJDRA==" * 8 + "\""),   // 64-char base64 blob
      (7L, "// AUTO-GENERATED by tool\n" + good)         // banner, any case
    ).toDF("doc_id", "text")
    val out = TextClean.codeRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass_code"))
    def failsOnly(id: Long, flag: String): Unit = {
      val r = out(id)
      assert(!r.getAs[Boolean](flag), s"doc $id should fail $flag")
      assert(!r.getAs[Boolean]("pass_code"))
    }
    failsOnly(2L, "pass_max_line")
    failsOnly(3L, "pass_avg_line")
    failsOnly(4L, "pass_alnum")
    failsOnly(5L, "pass_blobs")
    failsOnly(6L, "pass_blobs")
    failsOnly(7L, "pass_autogen")
    // the hex blob is counted as hex only (48 < 64 b64 chars once the
    // quote breaks the run); the b64 blob is counted as b64 only
    assert(out(5L).getAs[Long]("n_hex_blobs") == 1L &&
      out(5L).getAs[Long]("n_b64_blobs") == 0L)
    assert(out(6L).getAs[Long]("n_b64_blobs") == 1L &&
      out(6L).getAs[Long]("n_hex_blobs") == 0L)
  }

  test("blocklistFilter: exact, subdomain, most-specific, and no-substring matches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://example.com/x"),          // exact rule
      (2L, "https://ads.example.com/x"),      // subdomain of example.com AND exact ads rule
      (3L, "https://notexample.com/x"),       // suffix of the STRING but not of the domain
      (4L, "https://clean.org/x"),            // clean
      (5L, "https://deep.ads.example.com/x")  // two levels under both rules
    ).toDF("doc_id", "url")
      .select(col("doc_id"), TextClean.urlHost(col("url")).as("host"))
    val bl = Seq("example.com", "ads.example.com").toDF("rule")
    val out = TextClean.blocklistFilter(docs, bl).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("blocked"), r.getAs[String]("matched_rule"),
          r.getAs[Long]("n_matched"))).toMap
    assert(out(1L) == ((true, "example.com", 1L)))
    // the longer (more specific) rule wins the report
    assert(out(2L) == ((true, "ads.example.com", 2L)))
    assert(out(3L) == ((false, "", 0L))) // dot-suffix, not string-suffix
    assert(out(4L) == ((false, "", 0L)))
    assert(out(5L) == ((true, "ads.example.com", 2L)))
  }

  test("urlCanonicalize: case/port/fragment/tracking/param-order all collapse") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val canon = Seq(
      "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1&fbclid=z#frag",
      "https://www.ex.com/A/b?a=1&b=2",
      "http://ex.com:80",            // default http port + empty path
      "http://ex.com/",
      "https://ex.com:8443/p",       // NON-default port must survive
      "https://ex.com/p?ref=nav"     // all params tracking → no '?'
    ).toDF("url")
      .select(TextClean.urlCanonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(canon(0) == "https://www.ex.com/A/b?a=1&b=2")
    assert(canon(0) == canon(1), "messy and clean spellings must collapse")
    assert(canon(2) == "http://ex.com/" && canon(2) == canon(3))
    assert(canon(4) == "https://ex.com:8443/p")
    assert(canon(5) == "https://ex.com/p")
  }

  test("lineDedup: df>=minDf lines survive only at their first corpus position") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val boiler = "all rights reserved"
    val docs = Seq(
      (1L, Seq(boiler, "unique one", "shared twice")),
      (2L, Seq(boiler, "unique two", "shared twice")),
      (3L, Seq("unique three", boiler)),
      (4L, Seq(boiler) /* loses every line → no output row */)
    ).toDF("doc_id", "lines")
    val out = TextClean.lineDedup(docs, minDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("text"))).toMap
    // boiler occurs 4x (>=3): only doc 1 pos 0 keeps it; "shared twice"
    // occurs 2x (<3): everyone keeps it; order is preserved on reassembly
    assert(out(1L) == ((3L, s"$boiler\nunique one\nshared twice")))
    assert(out(2L) == ((2L, "unique two\nshared twice")))
    assert(out(3L) == ((1L, "unique three")))
    assert(!out.contains(4L))
  }

  test("boilerplate: per-group df+fraction rule removes chrome everywhere " +
      "in its group, leaves the same line alone elsewhere") {
    import spark.implicits._
    val chrome = "cookie banner"
    val docs = Seq(
      // group A (4 docs): chrome in 3/4 (df 3 >= 3, 75% >= 50%) → removed
      (1L, "a", Seq(chrome, "alpha")),
      (2L, "a", Seq(chrome, "beta")),
      (3L, "a", Seq("gamma", chrome)),
      (4L, "a", Seq("delta", "rare pair")),
      // "rare pair" in 2/4 of A: df 2 < minDocs → kept
      (5L, "a", Seq("rare pair")),
      // wait — 5 docs in A now: chrome df 3/5 = 60% >= 50%, still removed
      // group B (2 docs): same chrome line once (df 1 < 3) → kept
      (6L, "b", Seq(chrome, "epsilon")),
      (7L, "b", Seq("zeta")),
      // doc whose every line is chrome → husk row: n_kept 0, text ""
      (8L, "a", Seq(chrome))
    ).toDF("doc_id", "source", "lines")
    // NB with doc 8, A has 6 docs and chrome df=4: 4>=3, 66% >= 50%
    val out = TextClean.boilerplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text")))).toMap
    assert(out(1L) == ((1L, 1L, "alpha")))
    assert(out(3L) == ((1L, 1L, "gamma")), "no first-survivor: removed at every position")
    assert(out(4L) == ((2L, 0L, "delta\nrare pair")), "df < minDocs stays")
    assert(out(6L) == ((2L, 0L, s"$chrome\nepsilon")),
      "below-threshold group keeps the identical line")
    assert(out(8L) == ((0L, 1L, "")), "fully-stripped doc keeps its husk row")
  }

  test("bleu: hand-counted clipped precisions, identity scores 0, " +
      "zero-overlap orders null the composite, brevity penalty exact") {
    import spark.implicits._
    def t(s: String) = s.split(" ").toSeq
    val pairs = Seq(
      // p1 5/6, p2 3/5, p3 2/4, p4 1/3 against the one-word swap
      (1L, t("the cat sat on the mat"), t("the cat sat on a mat")),
      (2L, t("a b c d"), t("a b c d")), // identity → log2 BLEU = 0
      (3L, t("x y z w q"), t("q w z y x")), // unigrams only → null
      (4L, t("a b c"), t("a b c")), // shorter than maxN → null
      (5L, t("a b c d"), t("a b c d e f g h")) // brevity: c=4, r=8
    ).toDF("pair_id", "cand_toks", "ref_toks")
    val out = TextAnalysis.bleu(pairs).collect()
      .map(r => r.getAs[Long]("pair_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("p1_bp") == 8333L)
    assert(r1.getAs[Long]("p2_bp") == 6000L)
    assert(r1.getAs[Long]("p3_bp") == 5000L)
    assert(r1.getAs[Long]("p4_bp") == 3333L)
    assert(r1.getAs[Long]("bleu_log2_fp") < 0L)
    assert(out(2L).getAs[Long]("bleu_log2_fp") == 0L,
      "perfect match must score exactly log2(1) = 0")
    assert(out(3L).getAs[Long]("p1_bp") == 10000L)
    assert(out(3L).getAs[Long]("p2_bp") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("bleu_log2_fp")),
      "a zero-clip order sends textbook BLEU to 0 = 2^-inf → NULL here")
    assert(out(4L).isNullAt(out(4L).fieldIndex("p4_bp")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("bleu_log2_fp")))
    assert(out(5L).getAs[Long]("bp_log2_fp") == -94548L,
      "BP = exp(1 - 8/4) → log2 = -(4 * log2(e)) / 4 exactly")
  }

  test("htmlExtract: wrap∘extract is identity on adversarial text; " +
      "boilerplate blocks and live markup are stripped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the corpus fixture has no &/</> or whitespace runs, so the escape
    // bijection and collapse are pinned HERE, on text built to break them
    val adversarial = Seq(
      7L -> "plain words only",
      8L -> "a & b &amp; c &lt;already&gt; <b>bold</b> \"q\" 'a'",
      9L -> "tabs\tand\nnewlines   and   runs",
      10L -> "<script>alert(1)</script> stays TEXT once escaped"
    ).toDF("doc_id", "text")
    val out = adversarial
      .select(col("doc_id"), col("text"),
        TextClean.htmlExtract(
          TextClean.htmlWrap(col("doc_id"), col("text"))).as("ex"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    out.foreach { case (id, (text, ex)) =>
      val collapsed = text.replaceAll("[ \\t\\n\\r\\f]+", " ").trim
      assert(ex == s"doc $id $collapsed",
        s"roundtrip broke for $id: got '$ex'")
    }
    // raw (unescaped) markup in a page: blocks vanish whole, other tags
    // become word boundaries, entities decode, case-insensitive blocks
    val page = ("<HTML><HEAD><title>t</title></HEAD><body>" +
      "<NAV>menu</NAV><p>one</p><div>two<br/>three</div>" +
      "<SCRIPT type=\"x\">var a=\"<p>sneaky</p>\";</SCRIPT>" +
      "<style media=\"all\">p{}</style>keep &amp; this" +
      "<footer>drop</footer></body></HTML>")
    val got = Seq(page).toDF("h")
      .select(TextClean.htmlExtract(col("h"))).head.getString(0)
    assert(got == "one two three keep & this", s"got '$got'")
  }

  test("warc: synthesize∘parse recovers every record with verified lengths") {
    import spark.implicits._
    // multi-source, out-of-order insertion, and a payload that carries
    // CRLF runs (the page wraps it, so the separator regex must bind to
    // the FIRST blank line and the terminator to the LAST)
    val docs = Seq(
      (3L, "alpha beta", "web"),
      (1L, "gamma\r\n\r\ndelta", "web"),
      (2L, "epsilon", "books")
    ).toDF("doc_id", "text", "source")
    val parsed = TextClean.warcParse(TextClean.warcSynthesize(docs))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rec_idx")) ->
        (r.getAs[String]("uri"), r.getAs[Long]("declared_len"),
          r.getAs[Boolean]("length_ok"), r.getAs[String]("payload")))
      .toMap
    assert(parsed.size == 3)
    // records land in doc_id order within each source stream
    assert(parsed(("web", 0))._1 == "http://corpus.local/1")
    assert(parsed(("web", 1))._1 == "http://corpus.local/3")
    assert(parsed(("books", 0))._1 == "http://corpus.local/2")
    parsed.values.foreach { case (_, len, ok, payload) =>
      assert(ok, "declared Content-Length must match recovered payload")
      assert(len == payload.getBytes("UTF-8").length.toLong)
    }
    // the recovered payload is exactly the wrapped page — embedded CRLF
    // blank lines inside the body did not truncate it
    val page1 = parsed(("web", 0))._4
    assert(page1.contains("gamma\r\n\r\ndelta"))
    assert(page1.startsWith("<html>") && page1.endsWith("</html>"))
  }

  test("temperatureMix: budget-preserving, direction-correct, deterministic") {
    import spark.implicits._
    // 80/15/5 split — en must downsample, de must upsample
    val docs = (1 to 100).map { i =>
      val lang = if (i <= 80) "en" else if (i <= 95) "fr" else "de"
      (i.toLong, lang, 100L)
    }.toDF("doc_id", "lang", "n_chars")
    val mixed = TextAnalysis.temperatureMix(docs)
    val byLang = mixed.groupBy("lang")
      .agg(max("n_l").as("n"), max("target_docs").as("target"),
        sum("copies").as("realized"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // targets preserve the total budget up to per-stratum floor loss
    val targetSum = byLang.values.map(_._2).sum
    assert(targetSum <= 100 && targetSum >= 100 - byLang.size,
      s"budget drift: $targetSum")
    // α=1/2 flattens: majority target below its count, minority above
    assert(byLang("en")._2 < 80, s"en should downsample: ${byLang("en")}")
    assert(byLang("de")._2 > 5, s"de should upsample: ${byLang("de")}")
    // realized counts track targets within the Bernoulli remainder ±n
    byLang.foreach { case (l, (n, target, realized)) =>
      val base = target / n * n
      assert(realized >= base && realized <= base + n,
        s"$l realized=$realized outside [$base, ${base + n}]")
    }
    // md5-keyed, not rand(): byte-identical on a second invocation
    val again = TextAnalysis.temperatureMix(docs)
      .select("doc_id", "copies").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = mixed.select("doc_id", "copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == again)
  }

  test("curriculum: equal-size quality-ordered buckets, contiguous ranks") {
    import spark.implicits._
    // 25 docs into 4 buckets → sizes 7/6/6/6 spread evenly; quality is
    // driven by token count (lenScore), several exact ties included
    val docs = (1 to 25).map { i =>
      (i.toLong, Seq.fill(4 + (i % 5) * 3)("tok" + i).mkString(" "))
    }.toDF("doc_id", "text")
    val rows = TextAnalysis.curriculum(docs, 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_bp"),
        r.getAs[Long]("rank"), r.getAs[Long]("bucket")))
    assert(rows.length == 25)
    // ranks are a permutation of 1..25
    assert(rows.map(_._3).sorted.toSeq == (1L to 25L).toSeq)
    // quality never increases as rank increases
    val byRank = rows.sortBy(_._3)
    assert(byRank.sliding(2).forall(p => p(0)._2 >= p(1)._2),
      "rank must order by quality desc")
    // bucket sizes differ by at most 1 and are rank-contiguous
    val sizes = rows.groupBy(_._4).map { case (b, g) =>
      b -> (g.length, g.map(_._3).min, g.map(_._3).max) }
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.map(_._1).max - sizes.values.map(_._1).min <= 1,
      s"unbalanced buckets: $sizes")
    sizes.foreach { case (b, (n, lo, hi)) =>
      assert(hi - lo + 1 == n, s"bucket $b ranks not contiguous: $sizes")
    }
  }

  test("spanCoverage: boilerplate docs land high, organic docs in decile 0") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => "w" + i).mkString(" ") // one 8-token gram
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),       // fully covered ×3
      (4L, (1 to 40).map(i => "u" + i).mkString(" ")) // organic, no repeats
    ).toDF("doc_id", "text")
    val got = graft.ops.Substring.spanCoverage(docs, n = 8, minRep = 3)
      .collect()
      .map(r => r.getAs[Long]("cov_decile") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("covered_tokens"))).toMap
    // 3 docs at 100% coverage (decile 10), 1 doc at 0
    assert(got == Map(10L -> (3L, 24L), 0L -> (1L, 0L)), s"got $got")
  }

  test("intraDocLineDedup: first occurrences survive in order; cross-doc repeats untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "a", "c", "b", "a")), // adjacent + distant dups
      (2L, Seq("x", "y", "z")),                // all unique: passthrough
      (3L, Seq("a", "a", "a")),                // all same: collapses to one
      (4L, Seq("x", "y", "z"))                 // repeats doc 2 — must keep all
    ).toDF("doc_id", "lines")
    val got = docs
      .select($"doc_id", TextClean.intraDocLineDedup($"lines").as("kept"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got == Map(
      1L -> List("a", "b", "c"),
      2L -> List("x", "y", "z"),
      3L -> List("a"),
      4L -> List("x", "y", "z")), s"got $got")
  }

  test("pseudoLog2Long: the driver twin matches the column recursion " +
    "bit-for-bit across the range") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 9000L, 10000L, 65536L,
      4294967296L, (1L << 42) + 12345L)
    val df = TextAnalysis.withPseudoLog2(xs.toDF("x"), "x", "l")
      .collect().map(r => r.getAs[Long]("x") -> r.getAs[Long]("l")).toMap
    xs.foreach { x =>
      assert(TextAnalysis.pseudoLog2Long(x) == df(x),
        s"driver/column divergence at $x")
    }
  }

  test("pseudoLog2: fixed-point log2 tracks the real log2 to ~2^-10") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 7L, 10L, 100L, 1024L, 999983L)
    val got = TextAnalysis.withPseudoLog2(xs.toDF("x"), "x", "lfix")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val approx = got(x).toDouble / 65536.0
      val exact = math.log(x.toDouble) / math.log(2.0)
      // one-sided truncation: the recursion floors, never rounds up
      assert(approx <= exact + 1e-9 && exact - approx < 1e-3,
        s"log2($x): $approx vs $exact")
    }
    assert(got(1L) == 0L && got(2L) == 65536L && got(1024L) == 10 * 65536L)
  }

  test("charEntropy: degenerate, two-symbol, and natural text separate cleanly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaa"),                         // H = 0
      (2L, "ababababab"),                         // H = 1 bit/char
      (3L, "the quick brown fox jumps over the lazy dog")  // natural
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1L) == ((10L, 1L, 0L)))
    val (n2, d2, h2) = out(2L)
    assert(n2 == 10L && d2 == 2L && math.abs(h2 - 1000L) <= 1,
      s"two-symbol entropy $h2 millibits")
    val (_, _, h3) = out(3L)
    assert(h3 > 3500L && h3 < 4700L, s"natural-text entropy $h3 millibits")
  }

  test("markdownStats: every line role counts once, depth tracks the " +
    "deepest heading, plain prose is not markdownish") {
    import spark.implicits._
    val md = Seq(
      "# Title",
      "### Deep sub",
      "- item one",
      "1. item two",
      "```scala",
      "code line",
      "```",
      "| a | b |",
      "plain with [x](http://y) and [z](u) links").mkString("\n")
    val out = TextClean.markdownStats(
      Seq((1L, md), (2L, "just two\nplain lines")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val m = out(1L)
    assert(m.getAs[Long]("n_lines") == 9L)
    assert(m.getAs[Long]("n_headings") == 2L &&
      m.getAs[Long]("max_heading_depth") == 3L)
    assert(m.getAs[Long]("n_list_items") == 2L)
    assert(m.getAs[Long]("n_fence_lines") == 2L)
    assert(m.getAs[Long]("n_table_rows") == 1L)
    assert(m.getAs[Long]("n_links") == 2L)
    assert(m.getAs[Boolean]("is_markdownish"))
    val p = out(2L)
    assert(p.getAs[Long]("n_lines") == 2L &&
      p.getAs[Long]("n_headings") == 0L &&
      p.getAs[Long]("max_heading_depth") == 0L &&
      !p.getAs[Boolean]("is_markdownish"))
  }

  test("tokenDropout: rate lands near dropBp, seeds are independent, " +
    "zero rate is the identity, reruns are byte-stable") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, (1 to 50).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextClean.tokenDropout(docs, dropBp = 2000).collect()
    val dropped = out.map(_.getAs[Long]("n_dropped")).sum
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    assert(total == 2000L)
    // 2000 bp target on 2000 draws: allow a generous binomial band
    assert(dropped > 300 && dropped < 500, s"drop rate implausible: $dropped")
    // identity at rate 0
    val id = TextClean.tokenDropout(docs, dropBp = 0).collect()
    assert(id.forall(r => r.getAs[Long]("n_dropped") == 0L &&
      r.getAs[String]("text_aug") == r.getAs[String]("text")))
    // reruns reproduce byte-identically; a different seed does not
    val again = TextClean.tokenDropout(docs, dropBp = 2000).collect()
    assert(out.map(_.getAs[String]("text_aug")).toSeq ==
      again.map(_.getAs[String]("text_aug")).toSeq)
    val other = TextClean.tokenDropout(docs, dropBp = 2000, seed = "aug2")
      .collect()
    assert(out.map(_.getAs[String]("text_aug")).toSeq !=
      other.map(_.getAs[String]("text_aug")).toSeq)
  }

  test("jsDivergence: zero on identical corpora, one bit on disjoint, " +
    "symmetric, and midway drift lands strictly between") {
    import spark.implicits._
    def jsd(a: Seq[String], b: Seq[String]) =
      TextAnalysis.jsDivergence(
        a.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        b.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")).collect()(0)

    val same = Seq("alpha beta gamma", "beta gamma delta delta")
    val ident = jsd(same, same)
    assert(ident.getAs[Long]("jsd_millibits") == 0L)
    assert(ident.getAs[Long]("n_vocab_shared") ==
      ident.getAs[Long]("n_vocab_a"))

    val other = Seq("zeta eta theta", "eta theta iota iota")
    val disjoint = jsd(same, other)
    assert(disjoint.getAs[Long]("n_vocab_shared") == 0L)
    // true JSD of disjoint supports is exactly 1 bit; fixed-point
    // truncation may shave a few millibits but never exceed it
    val d = disjoint.getAs[Long]("jsd_millibits")
    assert(d >= 990L && d <= 1000L, s"disjoint JSD: $d millibits")

    val half = jsd(same, same ++ other)
    val h = half.getAs[Long]("jsd_millibits")
    assert(h > 0L && h < d, s"partial drift must sit between: $h")

    // symmetry: JSD(A,B) = JSD(B,A) in the exact fixed-point arithmetic
    val fwd = jsd(same, other).getAs[Long]("jsd_millibits")
    val rev = jsd(other, same).getAs[Long]("jsd_millibits")
    assert(fwd == rev)
  }

  test("zipfFit: a planted 1/r frequency law fits slope ≈ −1e6 with " +
      "high r²; a uniform vocabulary reads slope 0") {
    import spark.implicits._
    // group 'z': freq(w_r) = 240/r for ranks 1..16; group 'u': all equal
    val zWords = (1 to 16).flatMap(r => Seq.fill(240 / r)(s"w$r"))
    val uWords = (1 to 12).flatMap(r => Seq.fill(7)(s"v$r"))
    val docs = Seq((1L, "z", zWords.mkString(" ")),
      (2L, "u", uWords.mkString(" "))).toDF("doc_id", "lang", "text")
    val out = graft.ops.TextAnalysis.zipfFit(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    val (nz, slopeZ, r2Z) = out("z")
    assert(nz == 16)
    assert(slopeZ.exists(s => s > -1150000L && s < -850000L),
      s"zipf slope: $slopeZ")
    assert(r2Z.exists(_ >= 9000L), s"zipf r2: $r2Z")
    val (_, slopeU, r2U) = out("u")
    assert(slopeU.contains(0L), s"uniform slope: $slopeU")
    assert(r2U.isEmpty, "zero y-variance must yield NULL r2")
  }

  test("quantileNormalize: equal-size sources land on identical " +
      "normalized multisets; order within source preserved") {
    import spark.implicits._
    // source A: short low-quality docs; source B: long diverse docs —
    // wildly different raw score distributions, same size (4 each)
    def doc(i: Long, src: String, text: String) = (i, src, text)
    val rows = Seq(
      doc(1, "a", "x x x x"),
      doc(2, "a", "y y y y y y"),
      doc(3, "a", "z z w w q q"),
      doc(4, "a", "m n m n m n m n"),
      doc(5, "b", (1 to 80).map(i => s"tok$i").mkString(" ")),
      doc(6, "b", (1 to 60).map(i => s"word$i").mkString(" ")),
      doc(7, "b", (1 to 40).map(i => s"term$i").mkString(" ")),
      doc(8, "b", (1 to 90).map(i => s"item$i").mkString(" ")))
    val docs = rows.toDF("doc_id", "source", "text")
    val out = graft.ops.TextAnalysis.quantileNormalize(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    val bySrc = out.groupBy(_._2)
    // identical normalized multisets across equal-size sources — the
    // defining property of quantile normalization
    val normA = bySrc("a").map(_._5).sorted.toSeq
    val normB = bySrc("b").map(_._5).sorted.toSeq
    assert(normA == normB, s"a=$normA b=$normB")
    // raw distributions genuinely differed
    assert(bySrc("a").map(_._3).max < bySrc("b").map(_._3).min)
    // monotone within source: higher within-source rank → >= norm value
    Seq("a", "b").foreach { s =>
      val byRank = bySrc(s).sortBy(_._4).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x <= y },
        s"non-monotone in $s: ${byRank.toSeq}")
    }
  }

  test("repetitionRules: keyword stuffing, duplicated lines, and the exact " +
    "interval union of overlapping duplicated n-grams") {
    import spark.implicits._
    val docs = Seq(
      // 1: clean varied text, long enough that a count-1 top gram is a
      // small char fraction — every repetition signal low, passes
      (1L, (1 to 40).map(i => f"tok$i%02d").mkString(" ")),
      // 2: keyword stuffing — "buy cheap pills now" ×5 (20 tokens)
      (2L, Seq.fill(5)("buy cheap pills now").mkString(" ")),
      // 3: duplicated lines — 1 unique + 3 identical banner lines
      (3L, "original content line\nCOOKIE BANNER\nCOOKIE BANNER\nCOOKIE BANNER"),
      // 4: overlap fixture — dup 5-grams at starts 0,1,6,7 of 12 tokens:
      // union = min(5,1)+min(5,5)+min(5,1)+5 = 12 → full coverage
      (4L, "a b c d e f a b c d e f")
    ).toDF("doc_id", "text")
    val out = TextClean.repetitionRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val clean = out(1L)
    assert(clean.getAs[Long]("dup_line_frac_bp") == 0L &&
      clean.getAs[Long]("dup_5gram_frac_bp") == 0L &&
      clean.getAs[Boolean]("pass_repetition"))

    val stuffed = out(2L)
    // 20 tokens, all 5..10-grams repeat → full token coverage
    assert(stuffed.getAs[Long]("dup_5gram_frac_bp") == 10000L)
    assert(stuffed.getAs[Long]("dup_10gram_frac_bp") == 10000L)
    // top 4-gram = "buy cheap pills now" ×5 · 19 chars / 99 chars
    assert(stuffed.getAs[Long]("top_4gram_char_frac_bp") ==
      5L * 19L * 10000L / 99L)
    assert(!stuffed.getAs[Boolean]("pass_repetition"))

    val banner = out(3L)
    // 4 lines, 2 distinct → 2 beyond-first of 4; chars 2·13 of 60
    assert(banner.getAs[Long]("n_lines") == 4L)
    assert(banner.getAs[Long]("dup_line_frac_bp") == 5000L)
    assert(banner.getAs[Long]("dup_line_char_frac_bp") ==
      2L * 13L * 10000L / (21L + 3L * 13L))
    assert(!banner.getAs[Boolean]("pass_repetition"))

    val overlap = out(4L)
    assert(overlap.getAs[Long]("n_words") == 12L)
    assert(overlap.getAs[Long]("dup_5gram_frac_bp") == 10000L,
      "interval union of [0,5)∪[1,6)∪[6,11)∪[7,12) must cover all 12")
    // 7-grams: only "a b c d e f a"(0) vs "f a b c d e f"(5)? — no two
    // equal 7-grams exist in this fixture, so coverage is exactly 0
    assert(overlap.getAs[Long]("dup_7gram_frac_bp") == 0L)
  }

  test("chrF: identity max, disjoint floor, hand value, whitespace " +
    "invariance, and beta=2 weighting recall over precision") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, String)]) =
      TextAnalysis.chrF(rows.toDF("pair_id", "cand_text", "ref_text"))
        .collect().map(r => r.getAs[Long]("pair_id") -> r).toMap
    val out = run(Seq(
      (1L, "identical strings", "identical strings"),
      (2L, "aaaa", "bbbb"),
      (3L, "abcd", "abce"),
      (4L, "a b c d", "abcd"),   // whitespace stripped → same as (3)'s cand=ref case? no: equals ref exactly
      (5L, "ab", "abcdef"),      // precision-perfect, low recall
      (6L, "abcdef", "ab")))     // recall-perfect, low precision
    assert(out(1L).getAs[Long]("chrf_bp") == 10000L &&
      out(1L).getAs[Long]("chrp_bp") == 10000L)
    assert(out(2L).getAs[Long]("chrf_bp") == 0L &&
      out(2L).getAs[Long]("n_orders") == 4L)
    // hand: orders 1..4 give p=r of 7500,6666,5000,0 → mean 4791; P=R → F=P
    val hand = out(3L)
    assert(hand.getAs[Long]("chrp_bp") == 4791L &&
      hand.getAs[Long]("chrr_bp") == 4791L &&
      hand.getAs[Long]("chrf_bp") == 4791L)
    // whitespace-stripped cand "abcd" == ref "abcd" → perfect
    assert(out(4L).getAs[Long]("chrf_bp") == 10000L &&
      out(4L).getAs[Long]("n_cand_chars") == 4L)
    // chrF2: the recall-heavy direction must beat the precision-heavy one
    val (pHeavy, rHeavy) = (out(5L), out(6L))
    assert(pHeavy.getAs[Long]("chrp_bp") == 10000L &&
      rHeavy.getAs[Long]("chrr_bp") == 10000L)
    assert(rHeavy.getAs[Long]("chrf_bp") > pHeavy.getAs[Long]("chrf_bp"),
      "beta=2 must weight recall above precision")
  }

  test("rougeL: identity, hand LCS value, order sensitivity vs bag " +
    "overlap, disjoint floor, empty sides, and the prefix cut") {
    import spark.implicits._
    def run(rows: Seq[(Long, Seq[String], Seq[String])]) =
      TextAnalysis.rougeL(rows.toDF("pair_id", "cand_toks", "ref_toks"))
        .collect().map(r => r.getAs[Long]("pair_id") -> r).toMap
    val out = run(Seq(
      (1L, Seq("a", "b", "c"), Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c", "d", "e"), Seq("a", "x", "b", "y", "c")),
      (3L, Seq("a", "b"), Seq("b", "a")),       // bag overlap 2, LCS 1
      (4L, Seq("q", "w"), Seq("z", "t")),
      (5L, Seq.empty[String], Seq("a")),
      (6L, (1 to 30).map(i => s"t$i"), (1 to 30).map(i => s"t$i"))))
    assert(out(1L).getAs[Long]("lcs") == 3L &&
      out(1L).getAs[Long]("rouge_f_bp") == 10000L)
    // LCS(abcde, axbyc) = abc = 3 → P = 6000, R = 6000, F = 6000
    val hand = out(2L)
    assert(hand.getAs[Long]("lcs") == 3L &&
      hand.getAs[Long]("rouge_p_bp") == 6000L &&
      hand.getAs[Long]("rouge_f_bp") == 6000L)
    assert(out(3L).getAs[Long]("lcs") == 1L,
      "ROUGE-L must see order, not the bag")
    assert(out(4L).getAs[Long]("lcs") == 0L &&
      out(4L).getAs[Long]("rouge_f_bp") == 0L)
    assert(out(5L).getAs[Long]("lcs") == 0L &&
      out(5L).getAs[Long]("len_cand") == 0L)
    // the 16-token prefix cut: identical 30-token sides → lcs = 16
    assert(out(6L).getAs[Long]("lcs") == 16L &&
      out(6L).getAs[Long]("len_cand") == 16L)
  }

  test("spanCorrupt: lossless sentinel reconstruction, disjoint spans, " +
    "determinism, and a sane corpus-level mask rate") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, (1 to 40).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanCorrupt(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // reconstruction: substituting target span k for <extra_id_k> in the
    // input must rebuild the original token stream exactly — this also
    // proves spans are disjoint and in order
    (1L to 60L).foreach { i =>
      val r = out(i)
      val input = r.getAs[String]("input_text").split(" ").toSeq
      val target = r.getAs[String]("target_text")
      val spans = scala.collection.mutable.Map[Int, Seq[String]]()
      if (target.nonEmpty) {
        var cur = -1
        target.split(" ").foreach { t =>
          if (t.startsWith("<extra_id_")) {
            cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
            spans(cur) = Seq.empty
          } else spans(cur) = spans(cur) :+ t
        }
      }
      val rebuilt = input.flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }
      assert(rebuilt.mkString(" ") ==
        (1 to 40).map(t => s"w${i}_$t").mkString(" "),
        s"doc $i failed reconstruction")
      assert(r.getAs[Long]("n_masked") ==
        spans.values.map(_.size.toLong).sum)
      assert(r.getAs[Long]("n_spans") == spans.size.toLong)
    }

    // corpus mask rate near the T5 recipe's ~14% (wide deterministic band)
    val masked = out.values.map(_.getAs[Long]("n_masked")).sum.toDouble
    val total = out.values.map(_.getAs[Long]("n_tokens")).sum.toDouble
    assert(masked / total > 0.07 && masked / total < 0.25,
      s"mask rate off: ${masked / total}")

    // deterministic under the same seed; a different seed moves spans
    val again = TextAnalysis.spanCorrupt(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("input_text"))
      .toMap
    assert((1L to 60L).forall(i =>
      again(i) == out(i).getAs[String]("input_text")))
    val other = TextAnalysis.spanCorrupt(docs, seed = "ul2").collect()
      .map(r => r.getAs[String]("input_text")).toSet
    assert(other != (1L to 60L).map(i =>
      out(i).getAs[String]("input_text")).toSet)
  }

  test("scriptProfile: dominant script, 20% mixed-script flag, and the " +
    "no-letters 'none' case") {
    import spark.implicits._
    val out = TextAnalysis.scriptProfile(Seq(
      (1L, "plain ascii text only"),
      (2L, "привет мир hello"),        // cyrillic 9, latin 5 → mixed
      (3L, "例子文本"),                  // han only
      (4L, "12345 .,!?"),              // no letters in any script
      (5L, "a very long english sentence with один word")
    ).toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("dominant_script") == "latin" &&
      !out(1L).getAs[Boolean]("mixed_script"))
    val mixed = out(2L)
    assert(mixed.getAs[Long]("n_cyrillic") == 9L &&
      mixed.getAs[Long]("n_latin") == 5L)
    assert(mixed.getAs[String]("dominant_script") == "cyrillic" &&
      mixed.getAs[Boolean]("mixed_script"))
    assert(out(3L).getAs[String]("dominant_script") == "han" &&
      !out(3L).getAs[Boolean]("mixed_script"))
    assert(out(4L).getAs[String]("dominant_script") == "none" &&
      !out(4L).getAs[Boolean]("mixed_script"))
    // 4 cyrillic chars vs 35 latin: 4*5 = 20 < 35 → below the 20% bar
    val mostly = out(5L)
    assert(mostly.getAs[String]("dominant_script") == "latin" &&
      !mostly.getAs[Boolean]("mixed_script"))
  }

  test("readability: hand-counted words/sentences/syllables and the " +
    "milli-point FK/FRE arithmetic; tokenless doc gets NULL scores") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It is happy."),
      (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    // 6 words; 2 [.!?]+ runs; vowel groups: the=1 cat=1 sat.=1 it=1
    // is=1 happy.=2 → 7 syllables
    assert(r1.getAs[Long]("n_words") == 6L &&
      r1.getAs[Long]("n_sentences") == 2L &&
      r1.getAs[Long]("n_syllables") == 7L)
    // fk = 390·6 div 2 + 11800·7 div 6 − 15590 = 1170 + 13766 − 15590
    assert(r1.getAs[Long]("fk_grade_x1000") == -654L)
    // fre = 206835 − 1015·6 div 2 − 84600·7 div 6 = 206835 − 3045 − 98700
    assert(r1.getAs[Long]("fre_x1000") == 105090L)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_words") == 0L &&
      r2.getAs[Long]("n_sentences") == 1L &&
      r2.getAs[Long]("n_syllables") == 0L &&
      r2.isNullAt(r2.fieldIndex("fk_grade_x1000")) &&
      r2.isNullAt(r2.fieldIndex("fre_x1000")))
  }

  test("rougeN: clipped unigram/bigram overlap hand values; empty " +
    "candidate keeps its row with zero ratios") {
    import spark.implicits._
    val pairs = Seq(
      (1L, Seq("the", "cat", "the", "cat", "dog"),
        Seq("the", "cat", "sat")),
      (2L, Seq.empty[String], Seq("a"))).toDF("pid", "cand_toks", "ref_toks")
    val r1 = TextAnalysis.rougeN(pairs, "pid", 1).collect()
      .map(r => r.getAs[Long]("pid") -> r).toMap
    // unigrams: cand {the:2, cat:2, dog:1}, ref {the:1, cat:1, sat:1}
    // → overlap min-sum = 2; p = 2·10⁴/5 = 4000, r = 6666, f = 4999
    assert(r1(1L).getAs[Long]("n_grams_cand") == 5L &&
      r1(1L).getAs[Long]("n_grams_ref") == 3L &&
      r1(1L).getAs[Long]("n_overlap") == 2L &&
      r1(1L).getAs[Long]("rougen_p_bp") == 4000L &&
      r1(1L).getAs[Long]("rougen_r_bp") == 6666L &&
      r1(1L).getAs[Long]("rougen_f_bp") == 4999L)
    assert(r1(2L).getAs[Long]("n_grams_cand") == 0L &&
      r1(2L).getAs[Long]("n_grams_ref") == 1L &&
      r1(2L).getAs[Long]("rougen_p_bp") == 0L &&
      r1(2L).getAs[Long]("rougen_f_bp") == 0L)
    val r2 = TextAnalysis.rougeN(pairs, "pid", 2).collect()
      .map(r => r.getAs[Long]("pid") -> r).toMap
    // bigrams: cand {"the cat":2, "cat the":1, "cat dog":1}, ref
    // {"the cat":1, "cat sat":1} → overlap 1; p = 2500, r = 5000,
    // f = 2·2500·5000/7500 = 3333
    assert(r2(1L).getAs[Long]("n_grams_cand") == 4L &&
      r2(1L).getAs[Long]("n_grams_ref") == 2L &&
      r2(1L).getAs[Long]("n_overlap") == 1L &&
      r2(1L).getAs[Long]("rougen_p_bp") == 2500L &&
      r2(1L).getAs[Long]("rougen_r_bp") == 5000L &&
      r2(1L).getAs[Long]("rougen_f_bp") == 3333L)
    // both sides shorter than n: row survives with all-zero counts
    assert(r2(2L).getAs[Long]("n_grams_ref") == 0L &&
      r2(2L).getAs[Long]("n_overlap") == 0L)
  }
}
