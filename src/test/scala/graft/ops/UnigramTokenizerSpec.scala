package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class UnigramTokenizerSpec extends AnyFunSuite with SparkTestBase {

  test("unigram training: frequent substrings become pieces; " +
      "segmentations are valid and cost-consistent") {
    import spark.implicits._
    // 'abc' appears in many words with high frequency → after round 1
    // it should segment words as a unit; 'xyz' appears once → chars
    val docs = Seq.fill(20)("abcde abcfg habc") ++ Seq("xyz")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = UnigramTokenizer.train(df, rounds = 2, minSeedFreq = 3)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getString(3),
        r.getLong(4)))
      .toMap
    // reconstruction: pieces concatenate back to the word
    out.foreach { case (w, (_, _, seg, _)) =>
      assert(seg.split("\\|").mkString == w, s"$w → $seg")
    }
    // multi-char pieces win in the carrier words (chars lose to the
    // frequent substrings; equal-cost alternatives like ab|cde are
    // legitimate, so assert piece COUNT, not one specific split)
    Seq("abcde", "abcfg").foreach { w =>
      assert(out(w)._2 == 2, s"$w segmented as ${out(w)._3}")
    }
    // exact tie at the last step → the LONGER piece rule decides:
    // h|abc (k=3 final piece) beats ha|bc (k=2) at equal cost
    assert(out("habc")._3 == "h|abc", s"habc → ${out("habc")._3}")
    // the singleton word falls back to pieces that exist (chars at
    // minimum); n_pieces matches the segmentation
    out.foreach { case (w, (_, n, seg, _)) =>
      assert(n == seg.split("\\|").length, s"$w: $n vs $seg")
    }
    // frequencies carried through: 'abcde' seen 20×
    assert(out("abcde")._1 == 20L)
  }

  test("unigram training: a word of repeated rare chars segments to " +
      "singles; cost is monotone in length") {
    import spark.implicits._
    val df = Seq((1L, "ab abq abqq"), (2L, "ab abq abqq"))
      .toDF("doc_id", "text")
    val out = UnigramTokenizer.train(df, rounds = 1, minSeedFreq = 99L)
      .collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getLong(4))).toMap
    // seed freq 99 prunes every multi-char piece → all-chars fallback
    assert(out("ab")._1 == "a|b")
    assert(out("abq")._1 == "a|b|q")
    assert(out("abqq")._1 == "a|b|q|q")
    // with >1 piece in the vocab every char costs > 0 → cost grows
    assert(out("ab")._2 < out("abq")._2 && out("abq")._2 < out("abqq")._2)
  }
}
