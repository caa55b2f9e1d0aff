package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native CDC boundary kernel (graft_cdc_boundaries) must emit
  * bit-identical positions to the explode→mask-filter→collect_list
  * formulation it replaced in Substring.cdcChunks — same trailing
  * w-code-point window, same md5-first-byte ≤ 0x03 mask (hex '0' then
  * '0'..'3'), same 1-based positions, ascending. Verified against the
  * ORIGINAL Spark formulation, verbatim, on random ASCII and non-ASCII
  * payloads plus the short-payload edge cases.
  */
class CdcSpec extends AnyFunSuite with SparkTestBase {

  private def kernel(payload: String, w: Int): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("t")
      .select(org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.CdcBoundaries(
          org.apache.spark.sql.graftshim.GraftShim.expression(col("t")), w))
        .as("b"))
      .head().getSeq[Int](0)
  }

  /** The pre-r9 explode formulation, verbatim. */
  private def original(payload: String, w: Int): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("_bt")
      .filter(length(col("_bt")) >= w)
      .select(explode(sequence(lit(w), length(col("_bt")))).as("_i"),
        col("_bt"))
      .filter {
        val h = md5(col("_bt").substr(col("_i") - (w - 1), lit(w)))
        h.substr(lit(1), lit(1)) === "0" &&
          h.substr(lit(2), lit(1)).isin("0", "1", "2", "3")
      }
      .agg(sort_array(collect_list(col("_i"))).as("_bpos"))
      .head().getSeq[Int](0)
  }

  test("matches the explode formulation on random and edge payloads") {
    val rnd = new scala.util.Random(23)
    val payloads =
      (1 to 6).map(_ => Seq.fill(300 + rnd.nextInt(2000))(
        (32 + rnd.nextInt(95)).toChar).mkString) ++ // typical docs
      Seq(
        "x" * 16, // len == w exactly: one window tested
        "abcdefghijklmno", // len == w - 1: no window, empty
        "répétition déjà vu ünïcode — " * 40) // multi-byte code points
    payloads.foreach { p =>
      assert(kernel(p, 16) == original(p, 16), s"payload=${p.take(40)}")
    }
    // a non-default window width
    assert(kernel(payloads.head, 8) == original(payloads.head, 8))
  }

  test("cdcChunks end-to-end: chunks still reconstruct the document") {
    import spark.implicits._
    val text = Seq.fill(800)((97 + scala.util.Random.nextInt(26)).toChar)
      .mkString
    val chunks = graft.ops.Substring.cdcChunks(
        Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_idx").collect()
    val rebuilt = chunks.map(r =>
      text.substring(r.getAs[Int]("chunk_start") - 1,
        r.getAs[Int]("chunk_start") - 1 + r.getAs[Int]("chunk_len")))
      .mkString
    assert(rebuilt == text)
  }
}
