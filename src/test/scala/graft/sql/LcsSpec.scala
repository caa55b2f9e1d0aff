package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native LCS kernel (graft_lcs_length) must be bit-identical to the
  * nested-`aggregate` HOF DP it replaced in rougeL — same max-of-three
  * recurrence, same null semantics (a null element matches nothing,
  * including another null). Verified against (a) a plain Scala reference
  * DP on 300 random token arrays and (b) the ORIGINAL Spark HOF
  * formulation on adversarial fixtures, plus hand values.
  */
class LcsSpec extends AnyFunSuite with SparkTestBase {

  private def nativeLcs(a: Seq[String], b: Seq[String]): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("ct", "rt")
      .select(org.apache.spark.sql.graftshim.GraftShim.column(
        graft.sql.expressions.LcsLength(
          org.apache.spark.sql.graftshim.GraftShim.expression(col("ct")),
          org.apache.spark.sql.graftshim.GraftShim.expression(col("rt"))))
        .as("lcs"))
      .head().getLong(0)
  }

  /** The pre-r9 HOF formulation, verbatim (nulls never match). */
  private def hofLcs(a: Seq[String], b: Seq[String]): Long = {
    import spark.implicits._
    val df = Seq((a, b)).toDF("_ct", "_rt")
      .withColumn("_rl", size(col("_rt")).cast("long"))
    val dp = aggregate(col("_ct"),
      array_repeat(lit(0L), (col("_rl") + 1).cast("int")),
      (prev, c) => aggregate(col("_rt"), array(lit(0L)),
        (acc, r) => concat(acc, array(greatest(
          element_at(prev, size(acc) + 1),
          element_at(acc, size(acc)),
          element_at(prev, size(acc))
            + when(c === r, 1L).otherwise(0L))))))
    df.select(element_at(dp, -1).as("lcs")).head().getLong(0)
  }

  private def refDp(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val eq = a(i - 1) != null && a(i - 1) == b(j - 1)
      dp(i)(j) = math.max(dp(i - 1)(j - 1) + (if (eq) 1 else 0),
        math.max(dp(i - 1)(j), dp(i)(j - 1)))
    }
    dp(a.length)(b.length)
  }

  test("hand values + empties") {
    assert(nativeLcs(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3L)
    assert(nativeLcs(Seq("a", "b"), Seq("b", "a")) == 1L)
    assert(nativeLcs(Seq("x"), Seq("y")) == 0L)
    assert(nativeLcs(Seq.empty, Seq("a")) == 0L)
    assert(nativeLcs(Seq("a"), Seq.empty) == 0L)
    assert(nativeLcs(Seq("a", "x", "b", "x", "c"), Seq("a", "b", "c")) == 3L)
  }

  test("matches the reference DP on 300 random token arrays") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 300) {
      val a = Vector.fill(rnd.nextInt(17))(vocab(rnd.nextInt(vocab.size)))
      val b = Vector.fill(rnd.nextInt(17))(vocab(rnd.nextInt(vocab.size)))
      assert(nativeLcs(a, b) == refDp(a, b), s"a=$a b=$b")
    }
  }

  test("bit-identical to the old HOF formulation, incl. null semantics") {
    val cases = Seq(
      (Seq("a", "b", "c", "a"), Seq("b", "a", "b")),
      (Seq("t", "t", "t"), Seq("t", "t")),
      (Seq[String](null, "a", null), Seq[String](null, "a")), // nulls never match
      (Seq("a", null, "b"), Seq("a", "b")),
      (Seq.fill(16)("z"), Seq.fill(16)("z")))
    cases.foreach { case (a, b) =>
      assert(nativeLcs(a, b) == hofLcs(a, b), s"a=$a b=$b")
    }
  }

  test("rougeL end-to-end is unchanged by the kernel swap (hand fixture)") {
    import spark.implicits._
    val pairs = Seq(
      (1L, Seq("the", "cat", "sat"), Seq("the", "cat", "sat")),
      (2L, Seq("a", "b", "c", "d"), Seq("d", "c", "b", "a")),
      (3L, Seq.empty[String], Seq("x"))
    ).toDF("pair_id", "cand_toks", "ref_toks")
    val out = graft.ops.TextAnalysis.rougeL(pairs).orderBy("pair_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out == Seq((1L, 3L), (2L, 1L), (3L, 0L)))
  }
}
