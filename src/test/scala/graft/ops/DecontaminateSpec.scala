package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DecontaminateSpec extends AnyFunSuite with SparkTestBase {

  test("a leaked benchmark passage flags the document; clean() removes exactly those") {
    import spark.implicits._
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "colorless green ideas sleep furiously under a pale moon"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // 100: embeds benchmark 1's passage verbatim mid-document
      (100L, "intro words here the quick brown fox jumps over the lazy dog tonight and more trailing text"),
      // 101: clean
      (101L, "completely unrelated content about distributed query engines and parquet files"),
      // 102: shares a benchmark-2 5-gram twice? once — below minHits=2
      (102L, "she said colorless green ideas sleep furiously yesterday evening"))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.contaminationPairs(docs, bench, n = 5, minHits = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 1L)))
    assert(!pairs.exists(_._1 == 101L))
    // 102 shares several overlapping 5-grams of the same passage — a
    // verbatim 6+-token run produces 2+ distinct shared 5-grams
    val kept = Decontaminate.clean(docs, bench, n = 5, minHits = 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(101L))
    assert(!kept.contains(100L))
    // every removed doc is one contaminationPairs flagged, no more
    val flagged = Decontaminate.contaminationPairs(docs, bench, 5, 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(100L, 101L, 102L) -- flagged)
  }
}
