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

  test("mask build end-to-end: exact record count, hash-tiled file layout, " +
    "footer blooms serve lookups (the --mask-build headline's contract)") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-maskdb")
      .toString + "/db"
    val mask = "?d?d?d?d" // 10^4 candidates — the headline shape, small
    val words = MaskSource.expand(spark, mask)
      .as[String](org.apache.spark.sql.Encoders.STRING)
    val res = graft.pipeline.BuildJob.run(spark, words, out,
      graft.pipeline.BuildJob.Config(Seq("md5", "sha256"),
        sourceName = s"mask:$mask", numFiles = Some(8),
        bloomNdv = 4000L, footerBloom = true))
    assert(res.written && res.records ==
      2L * MaskSource.cardinality(mask), // 2 algos x 10^4, zero dups
      s"got ${res.records}")
    // range sort produced non-overlapping per-file hash ranges
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"), hex(col("hash")).as("h"))
      .groupBy("f").agg(min("h").as("lo"), max("h").as("hi"))
      .orderBy("lo").collect().map(r => (r.getString(1), r.getString(2)))
    assert(ranges.length == 8, s"got ${ranges.length} files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2")
      case _ =>
    }
    // the footer bloom rejects an absent probe and finds a present one
    val present = graft.core.Hashers.hex(
      graft.core.Hashers("sha256").hash("0042".getBytes("UTF-8")))
    val absent = graft.core.Hashers.hex(
      graft.core.Hashers("sha256").hash("not-in-mask".getBytes("UTF-8")))
    assert(graft.pipeline.QueryJob.run(spark, out,
      graft.pipeline.QueryJob.Params(present)).count() == 1L)
    assert(graft.pipeline.QueryJob.run(spark, out,
      graft.pipeline.QueryJob.Params(absent)).count() == 0L)
  }
}
