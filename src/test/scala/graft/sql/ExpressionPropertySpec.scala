package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Randomized (seeded, deterministic) property checks for the codegen
  * expressions against independent reference implementations — the specs
  * that catch codegen-vs-interpreted drift and charset/byte-order bugs
  * that hand-picked vectors miss.
  */
class ExpressionPropertySpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(20260812L)

  test("FloatVecDot equals the left-to-right double fold on random vectors") {
    import spark.implicits._
    val cases = Seq.fill(200) {
      val n = 1 + rnd.nextInt(96)
      val a = Array.fill(n)((rnd.nextGaussian() * 10).toFloat)
      val b = Array.fill(n)((rnd.nextGaussian() * 10).toFloat)
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(graft.ops.Similarity.dot(col("a"), col("b")))
      .as[Double].collect()
    cases.zip(got).zipWithIndex.foreach { case (((a, b), d), i) =>
      var ref = 0.0
      var k = 0
      while (k < a.length) { ref += a(k).toDouble * b(k).toDouble; k += 1 }
      // bit-exact: the kernel's contract is reproducible accumulation,
      // not approximate equality
      assert(java.lang.Double.doubleToLongBits(ref) ==
        java.lang.Double.doubleToLongBits(d), s"case $i: $ref vs $d")
    }
  }

  test("FloatMatVec equals row-by-row FloatVecDot bit-exactly on random matrices") {
    import spark.implicits._
    val dim = 64
    val rows = 48
    val flat = Array.fill(rows * dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val vecs = Seq.fill(100)(Array.fill(dim)((rnd.nextGaussian() * 5).toFloat))
    val got = vecs.toDF("v")
      .select(graft.ops.Similarity.matVec(col("v"), flat, rows).as("p"))
      .as[Seq[Double]].collect()
    vecs.zip(got).zipWithIndex.foreach { case ((v, p), c) =>
      assert(p.length == rows)
      (0 until rows).foreach { r =>
        var ref = 0.0
        var k = 0
        while (k < dim) { ref += v(k).toDouble * flat(r * dim + k); k += 1 }
        assert(java.lang.Double.doubleToLongBits(ref) ==
          java.lang.Double.doubleToLongBits(p(r)), s"case $c row $r")
      }
    }
    // null element → null result (same contract as FloatVecDot)
    import org.apache.spark.sql.types._
    val nullableDf = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(Seq(1.0f, null, 3.0f))),
      StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = true)))))
    assert(nullableDf
      .select(graft.ops.Similarity.matVec(col("v"), Array.fill(6)(1.0), 2))
      .collect().head.isNullAt(0))
  }

  test("codegen digestHex equals the pure-Scala registry on random strings") {
    import graft.sql.functions.digestHex
    import spark.implicits._
    // strings across charsets: ascii, accents, CJK, emoji, control chars
    val alphabets = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789 ",
      "äöüßéèñç¡¿",
      "日本語中文한국어",
      "🎉🚀💡🌍",
      "\t\n\r \u0000\u001f")
    val cases = Seq.fill(150) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(40)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    graft.core.Hashers.names.foreach { algo =>
      val got = cases.toDF("s")
        .select(digestHex(algo, col("s"))).as[String].collect()
      cases.zip(got).foreach { case (s, hex) =>
        val ref = graft.core.Hashers.hex(
          graft.core.Hashers(algo).hash(s.getBytes("UTF-8")))
        assert(hex == ref, s"$algo(${s.take(20)})")
      }
    }
  }

  test("hexLower round-trips random byte arrays (column and driver paths)") {
    import graft.sql.functions.{hexLower, hexToBytes}
    import spark.implicits._
    val cases = Seq.fill(100) {
      val n = rnd.nextInt(64)
      val bytes = new Array[Byte](n); rnd.nextBytes(bytes); bytes
    }
    val hexes = cases.toDF("b")
      .select(hexLower(col("b")).as("h"), unhex(hexLower(col("b"))).as("rt"))
      .as[(String, Array[Byte])].collect()
    cases.zip(hexes).foreach { case (in, (h, rt)) =>
      assert(java.util.Arrays.equals(in, rt)) // column-side round trip
      assert(java.util.Arrays.equals(in, hexToBytes(h))) // driver-side parse
      assert(h == h.toLowerCase && h.length == in.length * 2)
    }
  }

  test("exact dedup invariants hold on random corpora") {
    import spark.implicits._
    val docs = Seq.fill(300)(
      (rnd.nextInt(1000).toLong + rnd.nextInt(1000) * 1000L,
        s"text-${rnd.nextInt(40)}"))
      .distinctBy(_._1)
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.exact(docs, "doc_id", md5(col("text"))).collect()
    val n = docs.count()
    // every input row lands in exactly one group
    assert(out.map(_.getLong(2)).sum == n)
    // keep_id is the minimum doc_id of its group
    val byText = docs.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }
    assert(out.length == byText.size)
    assert(out.map(_.getLong(1)).toSet == byText.values.toSet)
  }
}
