package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class CorpusStatsSpec extends AnyFunSuite with SparkTestBase {

  test("vocabGrowth: first-occurrence decomposition matches a hand " +
    "curve; empty buckets densify; ttr NULL before any tokens") {
    import spark.implicits._
    // 4 docs over ids 0..7 (buckets of width 2 at nBuckets=4); ids 4-5
    // absent → bucket 2 is empty but still on the curve
    val docs = Seq(
      (0L, "a b a"),     // bucket 0: 3 tokens, vocab {a,b}
      (1L, "b c"),       // bucket 0: +2 tokens, new {c}
      (3L, "c d"),       // bucket 1: +2 tokens, new {d}
      (7L, "a e")        // bucket 3: +2 tokens, new {e}
    ).toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowth(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 5L, 3L)))
    assert(out(1L) == ((3L, 7L, 4L)))
    assert(out(2L) == ((3L, 7L, 4L))) // empty bucket carries forward
    assert(out(3L) == ((4L, 9L, 5L)))
    // all-empty-text corpus: tokens_cum stays 0 → ttr_bp NULL
    val nil = CorpusStats.vocabGrowth(
      Seq((0L, "")).toDF("doc_id", "text"), "doc_id", "text", 2).collect()
    assert(nil.length == 2 && nil.forall(_.isNullAt(4)))
  }

  test("burstiness: evenly spread term scores near 0, one-part term " +
    "scores 1 - its part share; absent parts contribute algebraically") {
    import spark.implicits._
    // 2 parts (ids 0/1): "x" once in each part; "y" twice, only part 0.
    // part tokens: part0 = x y y = 3, part1 = x = 1, T = 4.
    // DP(x): |1*4-2*3|/? — common-denominator form: cnt=2, parts
    //   present both: |1·4 − 2·3| + |1·4 − 2·1| = 2 + 2 = 4; absent: 0
    //   dp = 4 / (2·2·4) = 0.25 → 2500 bp
    // DP(y): cnt=2, present part0: |2·4 − 2·3| = 2; absent part1
    //   correction: 2·(4−3) = 2; dp = 4/(2·2·4) = 0.25 → 2500 bp
    val docs = Seq((0L, "x y y"), (1L, "x")).toDF("doc_id", "text")
    val out = CorpusStats.burstiness(docs, "doc_id", "text",
        nParts = 2, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("x") == ((2L, 2500L)))
    assert(out("y") == ((2L, 2500L)))
    // a term only in part 0 with part0 share 3/4: DP = 1 − 3/4 = 1/4 is
    // the same case as y; a perfectly proportional term scores 0:
    // "z" 3× in part0, 1× in part1 → v_i = s_i exactly
    val even = Seq((0L, "z z z"), (1L, "z")).toDF("doc_id", "text")
    val e = CorpusStats.burstiness(even, "doc_id", "text", 2, 10).collect()
    assert(e.head.getString(0) == "z" && e.head.getLong(2) == 0L)
  }

  test("burstiness: top-k cut is (cnt desc, token asc) deterministic") {
    import spark.implicits._
    val docs = Seq((0L, "b b a a c")).toDF("doc_id", "text")
    val out = CorpusStats.burstiness(docs, "doc_id", "text", 2, 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b")) // c (cnt 1) cut; a before b on the tie
  }

  test("ngramNovelty: all-novel and all-seen docs land in deciles 10 " +
    "and 0; short docs drop; duplicate grams dedupe") {
    import spark.implicits._
    val test = Seq(
      (1L, "a b c d"),       // grams {a b c, b c d} — both in ref → 0
      (3L, "x y z w x y z"), // grams {x y z, y z w, z w x, w x y} dup
                             // "x y z" dedupes → 4 distinct, none in
                             // ref → novelty 10000, decile 10
      (5L, "p q")            // < 3 tokens → dropped
    ).toDF("doc_id", "text")
    val ref = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val out = CorpusStats.ngramNovelty(test, ref, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((1L, 2L, 0L)))   // doc 1: 2 grams, 0 novel
    assert(out(10L) == ((1L, 4L, 4L)))  // doc 3: 4 distinct, all novel
    assert(out.size == 2)
  }
}
