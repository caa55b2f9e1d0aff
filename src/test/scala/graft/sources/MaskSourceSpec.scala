package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MaskSourceSpec extends AnyFunSuite with SparkTestBase {

  test("mask parsing: classes, literals, ?a union, escaped ?") {
    assert(MaskSource.charsets("?d").head == "0123456789")
    assert(MaskSource.charsets("a?d") == Seq("a", "0123456789"))
    assert(MaskSource.charsets("?a").head.length == 26 + 26 + 10 + 33)
    assert(MaskSource.charsets("??").head == "?")
    assert(MaskSource.cardinality("?l?l?d") == 26L * 26 * 10)
    intercept[RuntimeException](MaskSource.charsets("?x"))
    intercept[IllegalArgumentException](MaskSource.charsets("a?"))
  }

  test("expansion enumerates the exact cartesian product in stride order") {
    val got = MaskSource.expand(spark, "a?d?d")
      .collect().map(_.getString(0)).toSeq
    val want = for (i <- 0 to 9; j <- 0 to 9) yield s"a$i$j"
    assert(got.sorted == want.sorted && got.size == 100)
    // stride order: leftmost varies slowest (range id 0 → "a00", 1 → "a01")
    assert(got.take(3) == Seq("a00", "a01", "a02"))
    // symbol charset survives SQL-literal escaping (quote + backslash)
    val sym = MaskSource.expand(spark, "?s").collect().map(_.getString(0))
    assert(sym.toSet == MaskSource.charsets("?s").head.map(_.toString).toSet)
  }
}
