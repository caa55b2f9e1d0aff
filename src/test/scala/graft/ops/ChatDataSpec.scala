package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Semantics of the conversation validator on hand-built defect
  * fixtures; the q_text_chat_stats oracle checks engine-exactness.
  */
class ChatDataSpec extends AnyFunSuite with SparkTestBase {

  private def stats(convs: Seq[(Long, String)]) = {
    import spark.implicits._
    ChatData.conversationStats(convs.toDF("doc_id", "conv_json"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("conversationStats: well-formed, defective, and edge conversations") {
    val out = stats(Seq(
      1L -> """[{"role":"user","content":"hi there"},
               {"role":"assistant","content":"hello"}]""".replaceAll("\n\\s*", ""),
      2L -> """[{"role":"system","content":"be nice"},
               {"role":"user","content":"q one"},
               {"role":"assistant","content":"a one"},
               {"role":"user","content":"q two"}]""".replaceAll("\n\\s*", ""),
      3L -> """[{"role":"user","content":"a"},{"role":"user","content":"b"}]""",
      4L -> """[{"role":"assistant","content":"I speak first"},
               {"role":"user","content":"odd"}]""".replaceAll("\n\\s*", ""),
      5L -> """[{"role":"user","content":""},
               {"role":"assistant","content":"x"}]""".replaceAll("\n\\s*", ""),
      6L -> """[{"role":"user","content":"lonely"}]"""))
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_turns") == 2L &&
      r1.getAs[Long]("n_tokens") == 3L &&
      r1.getAs[Boolean]("pass_chat"))
    // system turn doesn't break alternation and isn't the "first" role
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_system") == 1L &&
      r2.getAs[Boolean]("starts_user") &&
      r2.getAs[Boolean]("alternates") && r2.getAs[Boolean]("pass_chat"))
    assert(!out(3L).getAs[Boolean]("alternates") &&
      !out(3L).getAs[Boolean]("pass_chat"))
    assert(!out(4L).getAs[Boolean]("starts_user") &&
      !out(4L).getAs[Boolean]("pass_chat"))
    assert(out(5L).getAs[Long]("n_empty_turns") == 1L &&
      !out(5L).getAs[Boolean]("pass_chat"))
    // a single turn alternates vacuously but fails the ≥2-turn gate
    assert(out(6L).getAs[Boolean]("alternates") &&
      !out(6L).getAs[Boolean]("pass_chat"))
  }

  test("preferencePairs: argmax/argmin, tie-breaks, and the margin gate") {
    import spark.implicits._
    val cands = Seq(
      // prompt 1: clear ordering
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L),
      // prompt 2: all tied → margin 0 → dropped
      (2L, 20L, 7L), (2L, 21L, 7L),
      // prompt 3: single candidate → dropped
      (3L, 30L, 4L),
      // prompt 4: tie at the top → chosen takes the larger id
      (4L, 40L, 9L), (4L, 41L, 9L), (4L, 42L, 1L)
    ).toDF("prompt_id", "cand_id", "score")
    val out = ChatData.preferencePairs(cands).collect()
      .map(r => r.getAs[Long]("prompt_id") -> r).toMap
    assert(out.keySet == Set(1L, 4L))
    val p1 = out(1L)
    assert(p1.getAs[Long]("chosen_id") == 11L &&
      p1.getAs[Long]("rejected_id") == 12L &&
      p1.getAs[Long]("margin") == 7L &&
      p1.getAs[Long]("n_candidates") == 3L)
    val p4 = out(4L)
    assert(p4.getAs[Long]("chosen_id") == 41L &&
      p4.getAs[Long]("rejected_id") == 42L)
  }

  test("fleissKappa: perfect agreement, known hand value, and chance floor") {
    import spark.implicits._
    def kappa(rows: Seq[(Long, Int, Int)]) =
      ChatData.fleissKappa(rows.toDF("item", "rater", "label")).collect()(0)

    // 3 raters × 4 items, unanimous: P̄ = 1, κ = 1.0000
    val perfect = kappa(for (i <- 0L to 3L; r <- 0 to 2)
      yield (i, r, (i % 2).toInt))
    assert(perfect.getAs[Long]("kappa_bp") == 10000L)
    assert(perfect.getAs[Long]("n_items") == 4L &&
      perfect.getAs[Long]("n_ratings_min") == 3L &&
      perfect.getAs[Long]("n_ratings_max") == 3L)

    // Fleiss' 1971 textbook-style hand check, 2 raters × 4 items:
    // items 0,1 agree on label 0; items 2,3 split 0/1.
    // cells: ss = 4+4+1+1+1+1 = 12? per item: (2²)=4,4,(1+1)=2,2 → a=12
    // nn = 8, n = 2 → P̄ = (12-8)/(8·1) = 0.5 → pbar_e8 = 50000000
    // c_0 = 6, c_1 = 2 → csq = 40 → P̄e = 40/64 = 0.625 → pe_e8 = 62500000
    // κ = (0.5-0.625)/(1-0.625) = -1/3 → trunc(-3333.33) = -3333
    val hand = kappa(Seq(
      (0L, 0, 0), (0L, 1, 0), (1L, 0, 0), (1L, 1, 0),
      (2L, 0, 0), (2L, 1, 1), (3L, 0, 0), (3L, 1, 1)))
    assert(hand.getAs[Long]("pbar_e8") == 50000000L)
    assert(hand.getAs[Long]("pe_e8") == 62500000L)
    assert(hand.getAs[Long]("kappa_bp") == -3333L)
    assert(hand.getAs[Long]("n_categories") == 2L)

    // variable ratings-per-item violates Fleiss' constant-n design:
    // the op must return NULL κ (not a silently wrong value), with the
    // violation visible in the n_ratings_* columns.
    val uneven = kappa(Seq(
      (0L, 0, 0), (0L, 1, 0), (0L, 2, 0), (1L, 0, 1), (1L, 1, 1)))
    assert(uneven.getAs[Long]("n_ratings_min") == 2L &&
      uneven.getAs[Long]("n_ratings_max") == 3L)
    assert(uneven.isNullAt(uneven.fieldIndex("pbar_e8")) &&
      uneven.isNullAt(uneven.fieldIndex("kappa_bp")))
  }

  test("cohenKappa: perfect pair, perfect disagreement, degenerate " +
    "single-label NULL, and co-rated-only restriction") {
    import spark.implicits._
    val ratings = Seq(
      // raters 0,1: identical varied labels over items 1-4 → κ = 1
      (1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 0L), (4L, 0L, 1L),
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 0L), (4L, 1L, 1L),
      // rater 2: always the opposite of rater 0 → κ = −1 (sign must
      // survive the truncation-toward-zero div)
      (1L, 2L, 1L), (2L, 2L, 0L), (3L, 2L, 1L), (4L, 2L, 0L),
      // raters 3,4: constant label 5 → their pair's denominator is 0
      (1L, 3L, 5L), (2L, 3L, 5L), (1L, 4L, 5L), (2L, 4L, 5L),
      // rater 5 rates only items 1,2, matching rater 0 exactly
      (1L, 5L, 0L), (2L, 5L, 1L)
    ).toDF("item", "rater", "label")
    val out = ChatData.cohenKappa(ratings).collect()
      .map(r => (r.getAs[Long]("r1"), r.getAs[Long]("r2")) -> r).toMap
    def bp(p: (Long, Long)) = {
      val r = out(p)
      if (r.isNullAt(r.fieldIndex("kappa_bp"))) None
      else Some(r.getAs[Long]("kappa_bp"))
    }
    assert(bp((0L, 1L)).contains(10000L))
    assert(bp((0L, 2L)).contains(-10000L),
      "perfect disagreement must be exactly −1")
    assert(bp((3L, 4L)).isEmpty,
      "single-label pair has undefined κ → NULL")
    // the partial rater pairs only over CO-rated items
    assert(out((0L, 5L)).getAs[Long]("n_items") == 2L &&
      bp((0L, 5L)).contains(10000L))
    // disjoint-label pair: pe = 0, agreement 0 → κ = 0
    assert(bp((0L, 3L)).contains(0L))
    // every pair is r1 < r2 and present exactly once
    assert(out.keys.forall { case (a, b) => a < b })
    assert(out.size == 15, s"C(6,2) pairs expected, got ${out.size}")
  }

  test("bradleyTerry: dominance chain orders correctly, strengths stay " +
    "normalized, zero-win items hit the MLE boundary") {
    import spark.implicits._
    // a beats b 9:1, b beats c 9:1, a beats c 9:1 — strict a > b > c
    val games =
      (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
        Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
        Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a")))
        .toDF("winner", "loser")
    val out = ChatData.bradleyTerry(games).collect()
      .map(r => r.getAs[String]("item") -> r).toMap
    val (wa, wb, wc) = (out("a").getAs[Long]("strength_micro"),
      out("b").getAs[Long]("strength_micro"),
      out("c").getAs[Long]("strength_micro"))
    assert(wa > wb && wb > wc, s"chain order violated: $wa $wb $wc")
    assert(out("a").getAs[Long]("rank") == 1L &&
      out("c").getAs[Long]("rank") == 3L)
    // renormalization pins Σw to K·10⁶ up to per-item truncation
    assert(math.abs(wa + wb + wc - 3000000L) <= 3L)
    assert(out("a").getAs[Long]("n_wins") == 18L &&
      out("a").getAs[Long]("n_games") == 20L)

    // an item that never wins collapses to the w = 0 boundary
    val shutout = ChatData.bradleyTerry(
      (Seq.fill(5)(("a", "b")) ++ Seq.fill(3)(("b", "c")) ++
        Seq.fill(2)(("a", "c"))).toDF("winner", "loser"))
      .collect().map(r => r.getAs[String]("item") -> r).toMap
    assert(shutout("c").getAs[Long]("strength_micro") == 0L)
    assert(shutout("c").getAs[Long]("n_wins") == 0L)

    // deterministic: a second run reproduces every strength exactly
    val again = ChatData.bradleyTerry(games).collect()
      .map(r => r.getAs[String]("item") ->
        r.getAs[Long]("strength_micro")).toMap
    assert(again("a") == wa && again("b") == wb && again("c") == wc)
  }

  test("render_md5 keys on the exact template, not the JSON formatting") {
    val out = stats(Seq(
      1L -> """[{"role":"user","content":"same text"}]""",
      2L -> """[ {"content":"same text", "role":"user"} ]""",
      3L -> """[{"role":"user","content":"same  text"}]"""))
    assert(out(1L).getAs[String]("render_md5") ==
      out(2L).getAs[String]("render_md5"))
    assert(out(1L).getAs[String]("render_md5") !=
      out(3L).getAs[String]("render_md5"))
  }

  test("dawidSkene: learned reliability resolves an even-panel tie that " +
      "majority vote breaks wrong; consensus is deterministic") {
    import spark.implicits._
    // truth: items 1-5 → 0, 6-10 → 1. Raters A,B perfect; C errs on
    // {6,7,10}; D errs on {8,9,10}. Item 10 splits the panel 2-2
    // (A,B → 1; C,D → 0), so majority-vote init tie-breaks to the WRONG
    // smaller label 0 — round 1's confusion counts then credit A,B
    // (who track the consensus everywhere else) over C,D (each caught
    // erring twice on consensus-1 items) and flip item 10 to 1.
    def truth(it: Long): Long = if (it <= 5) 0L else 1L
    val rows = for {
      it <- 1L to 10L
      (rater, errs) <- Seq("A" -> Set.empty[Long], "B" -> Set.empty[Long],
        "C" -> Set(6L, 7L, 10L), "D" -> Set(8L, 9L, 10L))
    } yield (it, rater, if (errs(it)) 1L - truth(it) else truth(it))
    val out = ChatData.dawidSkene(rows.toDF("item", "rater", "label"),
      nClasses = 2, rounds = 2).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("label")).toMap
    (1L to 10L).foreach { it =>
      assert(out(it) == truth(it), s"item $it: got ${out(it)}")
    }
    // deterministic: a second run reproduces labels AND scores exactly
    val s1 = ChatData.dawidSkene(rows.toDF("item", "rater", "label"),
      nClasses = 2, rounds = 2).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("score_fp")).toMap
    val s2 = ChatData.dawidSkene(rows.toDF("item", "rater", "label"),
      nClasses = 2, rounds = 2).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("score_fp")).toMap
    assert(s1 == s2)
  }

  test("krippendorffAlpha: perfect 10000, 2x2 disagreement -5000, ragged " +
    "hand case -3333, singleton-only pool NULL") {
    import spark.implicits._
    def one(rows: Seq[(Long, Long, String)]) = ChatData.krippendorffAlpha(
      rows.toDF("item", "rater", "label"), "item", "rater", "label")
      .collect().head
    val perfect = one(Seq((1L, 0L, "a"), (1L, 1L, "a"),
      (2L, 0L, "b"), (2L, 1L, "b"), (2L, 2L, "b")))
    assert(perfect.getAs[Long]("alpha_bp") == 10000L &&
      perfect.getAs[Long]("n_items") == 2L &&
      perfect.getAs[Long]("n_ratings") == 5L &&
      perfect.getAs[Long]("d_obs_scaled") == 0L)
    // two items each split a/b: Dobs = 4S, n = 4, Σn_c² = 8 →
    // α = 1 − 3·4S/(8S) = −0.5
    val split = one(Seq((1L, 0L, "a"), (1L, 1L, "b"),
      (2L, 0L, "a"), (2L, 1L, "b")))
    assert(split.getAs[Long]("alpha_bp") == -5000L)
    // ragged: i1=[a,a,b] (dis 4, w=1/2 → 2), i2=[a,b] (dis 2 → 2),
    // i3=[b] excluded → Dobs = 4S; n = 5, marginals a:3 b:2 →
    // D = 25 − 13 = 12; α = 1 − 4·4S/(12S) = −1/3 → trunc −3333
    val ragged = one(Seq((1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "b"),
      (2L, 0L, "a"), (2L, 1L, "b"), (3L, 0L, "b")))
    assert(ragged.getAs[Long]("alpha_bp") == -3333L &&
      ragged.getAs[Long]("n_items") == 2L &&
      ragged.getAs[Long]("n_ratings") == 5L &&
      ragged.getAs[Long]("d_obs_scaled") == 4L * ChatData.KrippendorffScale)
    // every item singly rated: no pair information — honest NULL
    val lone = one(Seq((1L, 0L, "a"), (2L, 1L, "b")))
    assert(lone.getAs[Long]("n_items") == 0L &&
      lone.isNullAt(lone.fieldIndex("alpha_bp")))
  }
}
