package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native DCT-hash kernel (graft_dct_hash64) must be bit-identical
  * to the four-stage `transform`/`aggregate` HOF fold it replaced in
  * dctHashWide — same code-point gray matrix with the mod-256 clamp,
  * same quantized BIGINT basis, same rank-32 AC median, same (u, v)
  * nibble render. Verified against (a) the ORIGINAL Spark HOF
  * formulation, verbatim, on random ASCII and non-ASCII payloads, and
  * (b) an independent plain-Scala reference fold.
  */
class DctHashSpec extends AnyFunSuite with SparkTestBase {

  private def kernel(payload: String): String = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("_s")
      .select(org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.DctHash64(
          org.apache.spark.sql.graftshim.GraftShim.expression(col("_s"))))
        .as("h"))
      .head().getString(0)
  }

  /** The pre-r9 HOF formulation, verbatim (minus the substring/decode
    * prelude — input is already the decoded payload string). */
  private def hofHash(payload: String): String = {
    import spark.implicits._
    val cqArr = array(graft.sql.expressions.DctHash64.basisQ
      .sortBy { case (x, u, _) => x * 8 + u }
      .map { case (_, _, c) => lit(c) }: _*)
    Seq(Tuple1(payload)).toDF("_s")
      .withColumn("_n", length(col("_s")).cast("long"))
      .withColumn("_cq", cqArr)
      .withColumn("_g", expr(
        "transform(sequence(0, 1023), p -> " +
          "pmod(CAST(ascii(substring(_s, CAST(p % _n AS INT) + 1, 1)) " +
          "AS BIGINT), 256))"))
      .withColumn("_r", expr(
        "if(size(_g) = 1024, " +
          "transform(sequence(0, 255), i -> aggregate(sequence(0, 31), 0L, " +
          "(acc, x) -> acc + element_at(_g, x * 32 + i % 32 + 1) * " +
          "element_at(_cq, x * 8 + CAST(i div 32 AS INT) + 1))), null)"))
      .withColumn("_c", expr(
        "if(size(_r) = 256, " +
          "transform(sequence(0, 63), i -> aggregate(sequence(0, 31), 0L, " +
          "(acc, y) -> acc + element_at(_r, CAST(i div 8 AS INT) * 32 + y + 1) * " +
          "element_at(_cq, y * 8 + i % 8 + 1))), null)"))
      .withColumn("_m", expr(
        "element_at(array_sort(slice(_c, 2, 63)), 32)"))
      .withColumn("_d", expr(
        "transform(sequence(0, 15), p -> " +
          "(CASE WHEN element_at(_c, p * 4 + 1) > _m THEN 8 ELSE 0 END) + " +
          "(CASE WHEN element_at(_c, p * 4 + 2) > _m THEN 4 ELSE 0 END) + " +
          "(CASE WHEN element_at(_c, p * 4 + 3) > _m THEN 2 ELSE 0 END) + " +
          "(CASE WHEN element_at(_c, p * 4 + 4) > _m THEN 1 ELSE 0 END))"))
      .withColumn("h", expr(
        "array_join(transform(_d, d -> " +
          "substring('0123456789abcdef', CAST(d AS INT) + 1, 1)), '')"))
      .select("h").head().getString(0)
  }

  /** Independent plain-Scala fold (no shared code with the kernel
    * beyond the basis literals). */
  private def refHash(payload: String): String = {
    val cps = payload.codePoints().toArray
    val n = cps.length
    val cq = new Array[Long](256)
    graft.sql.expressions.DctHash64.basisQ
      .foreach { case (x, u, c) => cq(x * 8 + u) = c }
    val g = Array.tabulate(1024)(p => (cps(p % n) % 256).toLong)
    val r = Array.tabulate(256) { i =>
      (0 until 32).map(x => g(x * 32 + i % 32) * cq(x * 8 + i / 32)).sum
    }
    val c = Array.tabulate(64) { i =>
      (0 until 32).map(y => r((i / 8) * 32 + y) * cq(y * 8 + i % 8)).sum
    }
    val m = c.drop(1).sorted.apply(31)
    (0 until 16).map { p =>
      val nib = (if (c(p * 4) > m) 8 else 0) + (if (c(p * 4 + 1) > m) 4 else 0) +
        (if (c(p * 4 + 2) > m) 2 else 0) + (if (c(p * 4 + 3) > m) 1 else 0)
      "0123456789abcdef".charAt(nib)
    }.mkString
  }

  test("matches reference fold on random payloads (short, long, non-ASCII)") {
    val rnd = new scala.util.Random(7)
    val payloads =
      (1 to 8).map(i => Seq.fill(3 + rnd.nextInt(40))(
        (32 + rnd.nextInt(95)).toChar).mkString) ++ // short ASCII
      (1 to 4).map(_ => Seq.fill(1100 + rnd.nextInt(400))(
        (32 + rnd.nextInt(95)).toChar).mkString) ++ // > 1024 chars
      Seq("héllo wörld ünïcode ß€", // 2-byte UTF-8 codepoints
        "emoji 😀 and 🍕 beyond the BMP", // surrogates
        "a") // single char
    payloads.foreach { p =>
      assert(kernel(p) == refHash(p), s"payload=${p.take(40)}")
    }
  }

  test("bit-identical to the old HOF formulation") {
    val payloads = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "héllo wörld ünïcode ß€ the clamp must match pmod 256",
      (1 to 200).map(i => s"tok$i").mkString(" "))
    payloads.foreach { p =>
      assert(kernel(p) == hofHash(p), s"payload=${p.take(40)}")
    }
  }

  test("empty string yields null (callers filter empties)") {
    import spark.implicits._
    val out = Seq(Tuple1("")).toDF("_s")
      .select(org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.DctHash64(
          org.apache.spark.sql.graftshim.GraftShim.expression(col("_s")))))
      .head()
    assert(out.isNullAt(0))
  }
}
