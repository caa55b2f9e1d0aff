package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BM25, collocations, and repeated-span behavior on hand corpora —
  * the battery oracle checks engine-exactness; these check the math.
  */
class RetrievalSpec extends AnyFunSuite with SparkTestBase {

  test("bm25: tf raises, rarity raises, length normalizes, absent terms absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat dog"),               // high tf for cat, short
      (2L, "cat dog"),                        // one cat, short
      (3L, "cat " + Seq.fill(60)("filler").mkString(" ")), // one cat, long
      (4L, "dog dog dog dog"),                // matches no query term
      (5L, "emu emu emu emu")                 // matches no query term
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, terms = Seq("cat", "zebra"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // only cat matches — docs 1,2,3; doc 4/5 never appear
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_._1 == 1L), "one matched term each")
    // more occurrences beat fewer at similar length
    assert(got(1L)._2 > got(2L)._2, s"tf must raise the score: $got")
    // same tf, much longer doc scores lower (length normalization)
    assert(got(2L)._2 > got(3L)._2, s"length must normalize down: $got")

    // rarity: 'rare' appears in 1 doc, 'common' in all 4 — with equal tf
    // and identical doc lengths, the rare term's contribution dominates
    val docs2 = Seq(
      (1L, "rare common pad1 pad2"),
      (2L, "common x pad1 pad2"),
      (3L, "common y pad1 pad2"),
      (4L, "common z pad1 pad2")
    ).toDF("doc_id", "text")
    val got2 = Retrieval.bm25(docs2, terms = Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2(1L) > 2 * got2(2L),
      s"rare-term doc must far outrank common-only docs: $got2")
    // hand check doc 2's single common-term score: N=4, df=4, dl=4=avgdl
    // idf = (4-4+0.5)/(4+0.5)+1 ; denom = 1 + 1.2*(1-0.75+0.75*1) = 2.2
    // score = floor(1e6 * idf * 2.2 / 2.2) = floor(1e6 * idf)
    val idf = (4.0 - 4 + 0.5) / (4 + 0.5) + 1.0
    assert(got2(2L) == math.floor(1000000.0 * idf).toLong)
  }

  test("collocations: lift isolates the glued pair and replays exactly") {
    import spark.implicits._
    // "new york" always co-occur; "the" pairs with everything
    val docs = Seq(
      (1L, "new york is big the end"),
      (2L, "new york the start"),
      (3L, "the big end"),
      (4L, "new york new york")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.collocations(docs, minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    assert(byPair.contains(("new", "york")))
    // hand replay of ("new","york"): n_ab=4; 'new' left-count=4 ('new york'
    // ×4); 'york' right-count=4; T = total bigram events
    val t = {
      val texts = Seq("new york is big the end", "new york the start",
        "the big end", "new york new york")
      texts.map(_.split(" ").length - 1).sum.toLong
    }
    val (_, _, nab, lift) = byPair(("new", "york"))
    assert(nab == 4L)
    assert(lift == 10000L * 4 * t / (4 * 4))
    // the glued pair outranks any pair involving the promiscuous 'the'
    rows.filter(r => r._1 == "the" || r._2 == "the").foreach { r =>
      assert(lift > r._4, s"glued pair must outrank 'the'-pairs: $r")
    }
  }

  test("liftE4: DECIMAL(38,0) lift agrees with BIGINT arithmetic in the " +
    "common region and stays exact past the Int64 wrap") {
    import spark.implicits._
    // common region (n_ab·T well under 9.2e14) + the overflow region a
    // trillion-bigram corpus hits (10⁴·n_ab·T ≈ 10²⁸): BIGINT wraps,
    // DECIMAL matches BigInt ground truth
    val cases = Seq(
      (4L, 4L, 4L, 17L),                      // the hand-replay fixture
      (12345L, 99999L, 88888L, 777777777L),   // common region
      (1000000000000L, 2000000000000L, 1500000000000L, 3000000000000L),
      (9000000000000L, 9000000000000L, 9000000000000L, 900000000000000L))
    val out = cases.toDF("n_ab", "n_a", "n_b", "t")
      .select(TextAnalysis.liftE4(col("n_ab"), col("n_a"), col("n_b"),
        col("t")).as("lift"))
      .collect().map(_.getLong(0))
    cases.zip(out).foreach { case ((nab, na, nb, t), got) =>
      val exp = (BigInt(10000) * nab * t / (BigInt(na) * nb)).toLong
      assert(got == exp, s"liftE4($nab,$na,$nb,$t): got $got want $exp")
      // in the common region the old BIGINT formula agrees; past the
      // wrap it provably would not (documents WHY the lift exists)
      if (BigInt(10000) * nab * t <= Long.MaxValue)
        assert(got == 10000L * nab * t / (na * nb))
    }
  }

  test("cutRepeatedSpans: first corpus occurrence survives verbatim, " +
    "later copies lose exactly the repeated region") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"intro words here $boiler trailer"),
      (3L, s"unique closing thoughts stand alone fine today ok $boiler")
    ).toDF("doc_id", "text")
    val out = Substring.cutRepeatedSpans(docs, n = 8, minRep = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 holds the first occurrence — untouched
    assert(out(1L).getAs[Long]("n_cut") == 0L)
    assert(out(1L).getAs[String]("text_clean") == s"$boiler alpha beta gamma")
    // docs 2 and 3 lose the 10-token boilerplate, keep their own words
    assert(out(2L).getAs[Long]("n_cut") == 10L)
    assert(out(2L).getAs[String]("text_clean") == "intro words here trailer")
    assert(out(3L).getAs[Long]("n_cut") == 10L)
    assert(out(3L).getAs[String]("text_clean") ==
      "unique closing thoughts stand alone fine today ok")
    assert(out(2L).getAs[Long]("n_tokens_before") == 14L &&
      out(2L).getAs[Long]("n_tokens_after") == 4L)
    // idempotence: cutting the cleaned corpus again is a no-op
    val again = Substring.cutRepeatedSpans(
      Substring.cutRepeatedSpans(docs, n = 8, minRep = 2)
        .select(col("doc_id"), col("text_clean").as("text")),
      n = 8, minRep = 2).collect()
    assert(again.forall(_.getAs[Long]("n_cut") == 0L))
  }

  test("repeatedSpans: merges overlap and adjacency into maximal spans") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // 10-token boilerplate
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"intro words here $boiler trailer"),
      (3L, s"$boiler middle $boiler"),
      (4L, "totally unrelated text with no repeats at all whatsoever here")
    ).toDF("doc_id", "text")
    // 8-token windows of the 10-token boilerplate appear ≥3 times (docs
    // 1, 2, 3×2); within each doc the 3 windows (pos p, p+1, p+2) overlap
    // into ONE maximal span of 10 tokens
    val got = Substring.repeatedSpans(docs, n = 8, minRep = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // doc1: span [0,10); doc2: starts at 3 → [3,13); doc3: two spans
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 0L, 10L), (2L, 3L, 13L), (3L, 0L, 10L), (3L, 11L, 21L)),
      s"maximal merged spans expected, got ${got.toSeq}")
    // each merged span swallowed its 3 overlapping windows
    assert(got.forall(_._4 == 3L), s"3 windows per span: ${got.toSeq}")
    // back-to-back adjacency also merges: two copies touching each other
    val docs2 = Seq((7L, s"$boiler $boiler x"),
      (8L, boiler), (9L, boiler)).toDF("doc_id", "text")
    val got2 = Substring.repeatedSpans(docs2, n = 10, minRep = 3)
      .filter(col("doc_id") === 7L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == Seq((0L, 20L)),
      s"adjacent copies must merge into one span: ${got2.toSeq}")
  }

  test("semanticDedup: fenced pairs cluster; keep is least centroid-similar") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // two tight groups far apart; ids chosen so the keep policy is
    // distinguishable from min-id: within each group the LAST vector is
    // tilted furthest from the group mean (lowest centroid cosine)
    val vecs = Seq(
      (0L, v(1, 0, 0)), (1L, v(0.99, 0.05, 0)), (2L, v(0.9, 0.3, 0)),
      (10L, v(0, 1, 0)), (11L, v(0.05, 0.99, 0)), (12L, v(0.3, 0.9, 0))
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity
      .semanticDedup(vecs, nCells = 2, lloydIters = 2, minCosBp = 9000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == 2, s"two duplicate groups expected: ${got.toSeq}")
    assert(got.map(_._3).forall(_ == 3L), s"each group has 3: ${got.toSeq}")
    // the kept member is the tilted one (2 / 12), NOT the min id
    assert(got.map(_._2).toSet == Set(2L, 12L),
      s"keep must be least centroid-similar, got ${got.toSeq}")
  }

  test("rboAgreement: identical lists max out, disjoint score 0, top swaps " +
      "cost more than bottom swaps") {
    import spark.implicits._
    def ranks(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (id, i) => (1L, id, i + 1) }
      .toDF("query_id", "cand_id", "rank")
    val base = ranks(1L to 8L)
    def rbo(b: org.apache.spark.sql.DataFrame): Long =
      graft.ops.Similarity.rboAgreement(base, b, k = 8, pBp = 9000L)
        .select("rbo_u").as[Long].head()
    val full = graft.ops.Similarity.rboWeights(8, 9000L).map(_._2).sum
    assert(rbo(base) == full, "identical rankings must score the weight sum")
    assert(rbo(ranks(11L to 18L)) == 0L, "disjoint rankings must score 0")
    val topSwap = rbo(ranks(Seq(2L, 1L, 3L, 4L, 5L, 6L, 7L, 8L)))
    val bottomSwap = rbo(ranks(Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 7L)))
    assert(topSwap < bottomSwap && bottomSwap < full,
      s"rank-biased: $topSwap < $bottomSwap < $full must hold")
  }

  test("kCenterCoreset: one pick per cluster first, radius non-decreasing, " +
      "exhaustion truncates") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // three directions: 0°, 90°, 45° — farthest-point-first must visit
    // all three clusters before returning to any of them
    val vecs = Seq(
      (0L, v(1, 0)), (1L, v(1, 0.02)),
      (10L, v(0, 1)), (11L, v(0.02, 1)),
      (20L, v(1, 1)), (21L, v(1, 1.02))
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.kCenterCoreset(vecs, k = 4)
      .orderBy("round")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got(0)._1 == 0L && got(0)._2.isEmpty, "seed is the lowest id")
    assert(got(1)._1 == 10L, "round 2 goes orthogonal (cos 0 beats 45°)")
    assert(Set(20L, 21L).contains(got(2)._1),
      s"round 3 must reach the diagonal cluster: ${got.toSeq}")
    // radius trace non-decreasing once picks exist
    val radii = got.drop(1).flatMap(_._2)
    assert(radii.sorted.toSeq == radii.toSeq,
      s"cover_bp must be non-decreasing: ${radii.toSeq}")
    // k beyond the corpus truncates instead of failing
    assert(graft.ops.Similarity.kCenterCoreset(vecs, k = 10).count() == 6L)
  }

  test("mmrRerank: redundancy penalized at low lambda; relevance at 10⁴; " +
      "shortlist exhaustion truncates") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // A and B are near-duplicates hugging the query; C is diverse but
    // less relevant — the canonical MMR situation
    val vecs = Seq(
      (100L, v(1, 0)), (1L, v(1, 0.05)), (2L, v(1, 0.06)), (3L, v(0.6, 0.8))
    ).toDF("vec_id", "embedding")
    val cands = graft.ops.Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 100L),
      vecs.filter(col("vec_id") =!= 100L), k = 3)
    def order(lam: Long, k: Int = 3): Seq[Long] = graft.ops.Similarity
      .mmrRerank(cands, vecs, kOut = k, lambdaBp = lam)
      .orderBy("mmr_rank").select("cand_id").as[Long].collect().toSeq
    // λ=1: pure relevance — the near-dup pair stays adjacent
    assert(order(10000L) == Seq(1L, 2L, 3L), "λ=10⁴ must be relevance order")
    // λ=0.3: B's ~0.9999 sim to selected A buries it below diverse C
    assert(order(3000L) == Seq(1L, 3L, 2L),
      "redundancy penalty must defer the near-duplicate")
    // kOut beyond the shortlist truncates instead of repeating/failing
    assert(order(3000L, k = 5).size == 3, "exhausted shortlist truncates")
  }

  test("prototypePrune: hardest kept per cell, ceil floor, norm-invariant") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // lloydIters = 0 pins prototypes at the first-2 seed (ids 0, 1), so
    // difficulty is exactly the cosine to an axis: cell0 = {0 easy,
    // 2 near, 4 hard}, cell1 = {1 easy, 5 easy-but-unnormalized, 6 hard}
    val vecs = Seq(
      (0L, v(1, 0)), (1L, v(0, 1)),
      (2L, v(1, 0.1)), (4L, v(0.9, 0.45)),
      (5L, v(0, 2)), (6L, v(0.3, 0.95))
    ).toDF("vec_id", "embedding")
    def kept(bp: Long): Map[Long, (Long, Long)] = graft.ops.Similarity
      .prototypePrune(vecs, nCells = 2, lloydIters = 0, keepHardBp = bp)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // keep half (ceil 1.5 -> 2 of 3 per cell): the hardest two, never
    // the prototype-exact members; |v|=2 on id 5 must still read "easy"
    val half = kept(5000L)
    assert(half.keySet == Set(2L, 4L, 6L, 1L),
      s"hardest-per-cell expected: $half")
    assert(half(4L)._1 == 1L && half(2L)._1 == 2L,
      s"cell0 ranks hardest-first: $half")
    assert(half(6L)._1 == 1L && half(1L)._1 == 2L,
      s"cell1 tie (1 vs 5 both exact) breaks to lower id: $half")
    assert(half.values.forall(_._2 == 3L), s"cell_n rides rows: $half")
    // ceil keep: even 1 bp keeps one member per non-empty cell
    assert(kept(1L).keySet == Set(4L, 6L),
      "a non-empty cell never empties (ceil keep)")
  }

  test("phraseSearch: consecutive-only matches, counts, repeated-word phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "slow hash batch then slow hash batch again"), // two matches
      (2L, "slow hash fast batch"),                       // broken phrase
      (3L, "batch hash slow"),                            // reversed
      (4L, "x slow hash batch y"),                        // one match mid-doc
      (5L, "")
    ).toDF("doc_id", "text")
    val got = graft.ops.Retrieval
      .phraseSearch(docs, Seq("slow", "hash", "batch"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (2L, 0L), 4L -> (1L, 1L)), s"got $got")
    // a phrase with a repeated word must align both occurrences
    val rep = Seq((1L, "a b a c a b a")).toDF("doc_id", "text")
    val got2 = graft.ops.Retrieval.phraseSearch(rep, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == Seq((1L, 2L, 0L)), s"got ${got2.toSeq}")
  }

  test("rrfFuse: both-run candidates beat single-run toppers; exact picos") {
    import spark.implicits._
    // doc 30 is mid-rank in BOTH runs; docs 10/20 top one run each
    val lex = Seq((0L, 10L, 900L), (0L, 30L, 800L), (0L, 40L, 700L))
      .toDF("query_id", "id", "score")
    val dense = Seq((0L, 20L, 9500L), (0L, 30L, 9000L), (0L, 50L, 8500L))
      .toDF("query_id", "id", "score")
    val got = graft.ops.Retrieval.rrfFuse(Seq(lex, dense), k = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // 30: rank 2 in both → 2·(10^12 div 62); singles: 10^12 div 61
    val both = 2 * (1000000000000L / 62)
    val single = 1000000000000L / 61
    assert(both > single)
    assert(got.head == (30L, 2L, both, 1), s"got ${got.toSeq}")
    // the two run-toppers tie on rrf_pico and n_runs → lower id first
    assert(got(1) == (10L, 1L, single, 2) && got(2) == (20L, 1L, single, 3),
      s"got ${got.toSeq}")
    assert(got.length == 5)
  }

  test("overlapRerank: exact-overlap doc beats partial; ties keep stage-1 order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // query tokens {a b c d}; doc 1 = exact match, doc 2 = half overlap
    // + noise, docs 3/4 = identical token sets (tie) in stage-1 order 4,3
    val queries = Seq((100L, Seq("a", "b", "c", "d"))).toDF("query_id", "q_toks")
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "x", "y", "z", "w")),
      (3L, Seq("a", "x")),
      (4L, Seq("a", "x"))
    ).toDF("doc_id", "d_toks")
    // stage-1 order deliberately WRONG (doc 1 last) — rerank must fix it
    val cands = Seq((100L, 2L, 1), (100L, 4L, 2), (100L, 3L, 3), (100L, 1L, 4))
      .toDF("query_id", "doc_id", "rank1")
    val got = Retrieval.overlapRerank(cands, queries, docs, topK = 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("f1_bp")))
    // f1: doc1 = 2·4/(4+4) = 1 → 10000; doc2 = 2·2/(4+6) = 0.4 → 4000;
    // docs 3,4 = 2·1/(4+2) → 3333, tie broken by rank1 (4 before 3)
    assert(got.toSeq == Seq((1L, 10000L), (2L, 4000L), (4L, 3333L),
      (3L, 3333L)), s"got ${got.toSeq}")
  }

  test("cdcChunks: lossless reconstruction; shared passage dedups across offsets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random body long enough to carry boundaries
    def noise(seed: String, n: Int): String =
      Iterator.iterate(seed)(s => s + " " + s.hashCode.toHexString)
        .dropWhile(_.length < n).next().take(n)
    val shared = noise("shared-passage", 400)
    val docs = Seq(
      (1L, noise("alpha", 150) + " " + shared),
      (2L, noise("betabeta-prefix-of-different-length", 310) + " " + shared),
      (3L, noise("gamma", 500)),
      (4L, "short")  // below the window size → one whole-doc chunk
    ).toDF("doc_id", "text")
    val chunks = Substring.cdcChunks(docs).collect()

    // reconstruction: chunks tile [1, len] in order with no gaps
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, txt) =>
      val cs = chunks.filter(_.getLong(0) == id).sortBy(_.getInt(1))
      assert(cs.head.getInt(2) == 1)
      assert(cs.map(_.getInt(3)).sum == txt.length, s"doc $id coverage")
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getInt(2) == a.getInt(2) + a.getInt(3), s"doc $id gap")
        case _ =>
      }
    }
    assert(chunks.count(_.getLong(0) == 4L) == 1)

    // content-defined: the shared 400-char tail yields identical chunk
    // md5s from BOTH docs despite different prefix lengths — the
    // property fixed-size blocking cannot have
    val m1 = chunks.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val m2 = chunks.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    val m3 = chunks.filter(_.getLong(0) == 3L).map(_.getString(4)).toSet
    assert((m1 & m2).nonEmpty, "shared passage must dedup across offsets")
    assert((m1 & m3).isEmpty && (m2 & m3).isEmpty, "disjoint docs share nothing")
  }

  test("winnowing: shared run >= w+k-1 tokens guarantees a shared " +
      "fingerprint; density lands near 2/(w+1)") {
    import spark.implicits._
    val k = 5; val w = 4
    val run = (1 to (w + k - 1)).map(i => s"r$i").mkString(" ") // 8 tokens
    def filler(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler("a", 20)} $run ${filler("b", 20)}"),
      (2L, s"${filler("c", 30)} $run"),
      (3L, filler("z", 60))
    ).toDF("doc_id", "text")
    val fps = Substring.winnowFingerprints(docs, k, w).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the paper's guarantee: the 8-token shared run contains a full
    // window of grams, so docs 1 and 2 must share >= 1 fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run missed")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "disjoint docs share nothing")
    // density: selected positions per doc ≈ 2/(w+1) of gram positions
    // (random md5 order), loosely bounded here
    val d1 = fps.count(_._1 == 1L).toDouble / (48 - k + 1)
    assert(d1 > 0.15 && d1 < 0.75, s"implausible winnow density $d1")
    // fp_pos always a valid gram position
    assert(fps.forall { case (_, _, p) => p >= 0 && p < 60 })
  }

  test("winnowing: rightmost-minimum tie rule and boilerplate df cap") {
    import spark.implicits._
    // every token identical: every gram hash identical, so each window's
    // min must resolve to its RIGHTMOST position — fingerprints are
    // exactly the positions eligible as a rightmost member
    val docs = Seq((1L, (1 to 20).map(_ => "x").mkString(" "))).toDF("doc_id", "text")
    val fps = Substring.winnowFingerprints(docs, k = 5, w = 4).collect()
      .map(r => (r.getString(1), r.getInt(2)))
    val positions = fps.map(_._2).sorted
    // grams 0..15, window starts 0..12; window p selects pos p+3
    assert(positions.toSeq == (3 to 15).toSeq,
      s"rightmost rule broken: ${positions.toSeq}")
    // df cap: a fingerprint present in more docs than maxDf never pairs
    val many = (1L to 10L).map(i => (i, s"${(1 to 8).map(j => s"s$j").mkString(" ")}"))
      .toDF("doc_id", "text")
    val matches = Substring.winnowMatches(many, k = 5, w = 4, maxDf = 8,
      minShared = 1L).collect()
    assert(matches.isEmpty, "df cap must drop 10-doc boilerplate hashes")
  }

  test("phraseBlocklist: rare-token anchoring finds exact phrases, " +
    "overlaps count, single-token and absent phrases behave") {
    import spark.implicits._
    import graft.ops.Retrieval
    val docs = Seq(
      (1L, "the cat sat on the mat near the zebra crossing"),
      (2L, "a a a b"),                 // "a a" overlaps: positions 1, 2
      (3L, "the the the"),             // stop-word phrase territory
      (4L, "clean text with nothing flagged"),
      (5L, "bad\tphrase spans a tab\nand bad\nphrase a newline")
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseBlocklist(docs,
        Seq("the zebra", "a a", "mat", "missing phrase", "the the",
          "bad phrase"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase")) ->
        (r.getAs[Long]("n_occ"), r.getAs[Long]("first_pos"))).toMap
    // "the zebra" anchors on 'zebra' (df 1), not 'the' (df 6)
    assert(out((1L, "the zebra")) == (1L, 8L))
    assert(out((1L, "mat")) == (1L, 6L))
    assert(out((2L, "a a")) == (2L, 1L), "overlaps must each count")
    assert(out((3L, "the the")) == (2L, 1L))
    assert(!out.keys.exists(_._2 == "missing phrase"))
    assert(!out.keys.exists(_._1 == 4L))
    // \s+ tokenization: phrases spanning a tab or newline still match
    assert(out((5L, "bad phrase")) == (2L, 1L),
      "tab/newline-separated tokens must match the phrase split")
  }

  test("anisotropy: identical cloud at 10000, symmetric cloud at 0, " +
    "all-zero NULL, and per-group split") {
    import spark.implicits._
    import graft.ops.Similarity
    def emb(rows: Seq[(Long, Seq[Float], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
    // one repeated vector: mean IS the vector → aniso exactly 10⁴
    val same = Similarity.anisotropy(
      emb((1L to 3L).map(i => (i, Seq(0.6f, 0.8f), 0)))).collect()(0)
    assert(same.getAs[Long]("aniso_bp") == 10000L &&
      same.getAs[Long]("n_vecs") == 3L && same.getAs[Long]("dim") == 2L)
    // v and −v: the mean cancels exactly (quantization is symmetric on
    // exactly-representable components) → aniso 0
    val sym = Similarity.anisotropy(emb(Seq(
      (1L, Seq(0.5f, 0.25f), 0), (2L, Seq(-0.5f, -0.25f), 0)))).collect()(0)
    assert(sym.getAs[Long]("mean_dir_sq_micro2") == 0L &&
      sym.getAs[Long]("aniso_bp") == 0L)
    // all-zero group → NULL (the honest undefined)
    val zero = Similarity.anisotropy(emb(Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(0f, 0f), 0)))).collect()(0)
    assert(zero.isNullAt(zero.fieldIndex("aniso_bp")))
    // groups stay independent: an isotropic label next to a degenerate one
    val byLabel = Similarity.anisotropy(
      emb(Seq((1L, Seq(1f, 0f), 0), (2L, Seq(-1f, 0f), 0),
        (3L, Seq(0.6f, 0.8f), 1), (4L, Seq(0.6f, 0.8f), 1))),
      groupCols = Seq("label")).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("aniso_bp")).toMap
    assert(byLabel(0) == 0L && byLabel(1) == 10000L, s"got $byLabel")
  }
}
