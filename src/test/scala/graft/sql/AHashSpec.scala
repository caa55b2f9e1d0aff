package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native average-hash kernel (graft_ahash64) must be bit-identical
  * to the explode→aggregate pipeline it replaced in Multimodal's
  * aHashBits — same 64-equal-code-point segmentation, same
  * cross-multiplied BIGINT vote, same empty-segment semantics under
  * n < 64, same d1..d16/phash rendering. Verified against the ORIGINAL
  * Spark formulation, verbatim, on random ASCII and BMP non-ASCII
  * payloads plus the short-payload edge cases.
  */
class AHashSpec extends AnyFunSuite with SparkTestBase {

  /** d1..d16 + phash through the new kernel path. */
  private def kernel(payload: String): (Seq[Int], String) = {
    import spark.implicits._
    val h = org.apache.spark.sql.graftshim.GraftShim.column(
      graft.sql.expressions.AHash64(
        org.apache.spark.sql.graftshim.GraftShim.expression(col("_s"))))
    val row = Seq(Tuple1(payload)).toDF("_s")
      .select((1 to 16).map(p =>
        shiftrightunsigned(h, 4 * (16 - p)).bitwiseAND(15L)
          .cast("int").as(s"d$p")): _*)
      .withColumn("phash",
        concat((1 to 16).map(p =>
          expr(s"substring('0123456789abcdef', d$p + 1, 1)")): _*))
      .head()
    ((0 until 16).map(row.getInt), row.getString(16))
  }

  /** The pre-r9 explode→aggregate formulation, verbatim. */
  private def original(payload: String): (Seq[Int], String) = {
    import spark.implicits._
    val chars = Seq((1L, payload)).toDF("doc_id", "_s")
      .withColumn("_n", length(col("_s")).cast("long"))
      .select(col("doc_id"), col("_n"),
        posexplode(split(col("_s"), "")).as(Seq("pos", "c")))
      .withColumn("seg", expr("CAST(pos AS BIGINT) * 64 DIV _n"))
      .withColumn("v", ascii(col("c")).cast("long"))
    val segs = chars.groupBy("doc_id", "seg")
      .agg(sum(col("v")).as("ssum"), count(lit(1)).as("slen"))
    val tot = segs.groupBy("doc_id")
      .agg(sum(col("ssum")).as("tsum"), sum(col("slen")).as("tlen"))
    val bits = segs.join(tot, "doc_id")
      .withColumn("bit",
        col("ssum") * col("tlen") > col("tsum") * col("slen"))
    val digitAggs = (1 to 16).map { p =>
      sum(when(col("seg") >= (p - 1) * 4 && col("seg") < p * 4 && col("bit"),
        expr("1 << (3 - CAST(seg % 4 AS INT))")).otherwise(0))
        .cast("int").as(s"d$p")
    }
    val row = bits.groupBy("doc_id").agg(digitAggs.head, digitAggs.tail: _*)
      .withColumn("phash",
        concat((1 to 16).map(p =>
          expr(s"substring('0123456789abcdef', d$p + 1, 1)")): _*))
      .head()
    ((1 to 16).map(row.getInt), row.getString(17))
  }

  test("matches the original formulation on random and edge payloads") {
    val rnd = new scala.util.Random(11)
    val payloads =
      (1 to 6).map(_ => Seq.fill(80 + rnd.nextInt(400))(
        (32 + rnd.nextInt(95)).toChar).mkString) ++ // typical frames
      (1 to 4).map(_ => Seq.fill(1 + rnd.nextInt(63))(
        (32 + rnd.nextInt(95)).toChar).mkString) ++ // n < 64: empty segs
      Seq("a", "ab",
        "x" * 64, // constant payload: all votes tie, hash = 0
        "héllo wörld ß ünïcode" * 8) // BMP non-ASCII code points
    payloads.foreach { p =>
      assert(kernel(p) == original(p), s"payload=${p.take(40)}")
    }
  }

  test("empty payload yields null (callers filter empties)") {
    import spark.implicits._
    val out = Seq(Tuple1("")).toDF("_s")
      .select(org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.AHash64(
          org.apache.spark.sql.graftshim.GraftShim.expression(col("_s")))))
      .head()
    assert(out.isNullAt(0))
  }
}
