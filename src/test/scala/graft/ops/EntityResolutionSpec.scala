package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class EntityResolutionSpec extends AnyFunSuite with SparkTestBase {

  private def keysOf(names: Seq[String]): Map[String, String] = {
    import spark.implicits._
    names.toDF("n")
      .select(col("n"), EntityResolution.phoneticKey(col("n")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("phoneticKey: classes, run collapse, vowel transparency, padding") {
    val k = keysOf(Seq(
      "robert", "rupert",   // classic soundex pair → same key
      "jonsen", "jonson",   // vowel difference invisible
      "lee",                // short tail → zero-padded
      "o'brien-smyth"       // punctuation must not leak into the key
    ))
    assert(k("robert") == k("rupert"), s"${k("robert")} vs ${k("rupert")}")
    assert(k("jonsen") == k("jonson"))
    assert(k("lee") == "L000")
    assert(k("robert") == "R163")
    // tail "'brien-smyth" → b1 r6 n5 s2 m5 t3 (collapse 525→keeps) → 165
    assert(k("o'brien-smyth") == "O165", k("o'brien-smyth"))
  }

  test("blockedMatches: key-preserving edits pair up; different names never do") {
    import spark.implicits._
    val recs = Seq(
      (1L, "gray falcon"), (2L, "gray falcan"),   // vowel edit, dist 1
      (3L, "grray falcon"),                        // duplicated consonant, dist 1
      (4L, "silver harbor"), (5L, "silver harbor"),// exact duplicate
      (6L, "completely different")
    ).toDF("rec_id", "name")
    val got = EntityResolution.blockedMatches(recs, "rec_id", "name")
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)),
      s"got ${got.keySet}")
    assert(got((1L, 2L)) == 1L && got((1L, 3L)) == 1L && got((4L, 5L)) == 0L)
  }

  test("blockedMatches: same block but distant names are verified away") {
    import spark.implicits._
    // same phonetic key (R163), edit distance far above 2
    val recs = Seq((1L, "robert"), (2L, "rupertson-barat")).toDF("rec_id", "name")
    val keyed = recs.select(EntityResolution.phoneticKey(col("name")).as("k"))
      .collect().map(_.getString(0))
    assert(keyed.distinct.length == 1, s"fixture must collide: $keyed")
    assert(EntityResolution.blockedMatches(recs, "rec_id", "name").count() == 0)
  }
}
