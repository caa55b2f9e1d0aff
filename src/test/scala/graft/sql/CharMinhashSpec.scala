package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Dedup

/** The native char-MinHash kernel (graft_char_minhash) must emit
  * bit-identical lane minima to the explode→distinct→groupBy md5
  * formulation it replaced in Dedup.minhashLshChars — same
  * whitespace-stripped code-point grams, same md5(s ‖ "|" ‖ gram)
  * family, same lexicographic hex-string min. Verified against the
  * ORIGINAL Spark formulation, verbatim, on random multi-script
  * payloads (incl. tabs, U+3000, CJK, repeated grams) plus the
  * shorter-than-a-gram edge cases.
  */
class CharMinhashSpec extends AnyFunSuite with SparkTestBase {

  private val n = 5
  private val k = 8

  private def docs(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** Kernel path, exactly as minhashLshChars now builds signatures. */
  private def kernel(d: DataFrame): Map[Long, Seq[String]] = {
    val ct = col("_ct")
    d.select(col("doc_id"),
        regexp_replace(col("text"), Dedup.WhitespaceClass, "").as("_ct"))
      .filter(length(ct) >= n)
      .select(col("doc_id"), org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.CharMinhash(
          org.apache.spark.sql.graftshim.GraftShim.expression(ct), n, k))
        .as("_ms"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
  }

  /** The pre-r10 formulation, verbatim: distinct char shingles →
    * groupBy(doc_id) with k min(md5(...)) aggregates.
    */
  private def original(d: DataFrame): Map[Long, Seq[String]] = {
    def fam(s: Int) = md5(concat(lit(s.toString), lit("|"), col("w")))
    Dedup.charShingles(d, n)
      .groupBy("doc_id").agg(
        min(fam(0)).as("m0"),
        (1 until k).map(s => min(fam(s)).as(s"m$s")): _*)
      .collect()
      .map(r => r.getLong(0) -> (0 until k).map(i => r.getString(i + 1)))
      .toMap
  }

  test("matches the explode formulation on random and edge payloads") {
    val rnd = new scala.util.Random(31)
    val scripts = Seq(
      () => (32 + rnd.nextInt(95)).toChar, // ASCII
      () => (0x4e00 + rnd.nextInt(500)).toChar, // CJK
      () => "aàáâεжω—　\t ".charAt(rnd.nextInt(11))) // mixed + ws
    val payloads =
      (1 to 8).map { i =>
        val pick = scripts(i % scripts.size)
        Seq.fill(50 + rnd.nextInt(800))(pick()).mkString
      } ++ Seq(
        "abcde", // exactly one gram
        "abcd", // shorter than a gram: no signature row
        " \t　 ", // whitespace only: strips to empty
        "ababababababab", // heavily repeated grams (distinct ≪ occurrences)
        "深度學習 模型 訓練 語料 去重 深度學習") // CJK with re-space overlap
    val d = docs(payloads)
    val got = kernel(d)
    val want = original(d)
    assert(got.keySet == want.keySet, "doc sets differ")
    for ((id, sig) <- want)
      assert(got(id) == sig, s"doc $id signatures differ")
    // the sub-gram (doc 9: "abcd") and whitespace-only (doc 10) docs
    // must have NO signature row on either path
    assert(!want.contains(9L) && !got.contains(9L))
    assert(!want.contains(10L) && !got.contains(10L))
  }

  test("minhashLshChars end-to-end result unchanged (tab re-space dedup)") {
    // the q_dedup_minhash_char shape in miniature: a doc and its
    // tab-re-spaced twin must verify at jaccard 1.0 through the kernel
    val base = "深度學習模型在大規模語料上的訓練需要去重 處理流程"
    val d = docs(Seq(base, base.replace(" ", "\t")))
    val out = Dedup.minhashLshChars(d, threshold = 0.0)
      .select("i", "j", "jaccard").collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 1.0)
  }
}
