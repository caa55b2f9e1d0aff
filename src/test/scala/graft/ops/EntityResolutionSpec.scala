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

  test("sortedNeighborhood: neighbor-bucket join finds every |Δrank|<w " +
      "pair exactly once (no-edit-gate census vs direct ranks)") {
    import spark.implicits._
    val names = Seq("alice", "alicf", "bob", "carol", "carom", "dave",
      "erin", "frank", "gina", "hank", "alic", "boc")
    val recs = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("rec_id", "name")
    // maxDist large = no verification gate: output is the pure window
    // census, comparable against the direct global-rank definition
    val got = EntityResolution.sortedNeighborhood(recs, "rec_id", "name",
        w = 3, maxDist = 99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val ranked = names.zipWithIndex.map { case (n, i) => (n, i.toLong) }
      .sortBy(_._1).zipWithIndex
      .map { case ((_, id), rk) => (id, rk.toLong) }
    val expected = (for {
      (i1, r1) <- ranked; (i2, r2) <- ranked
      if r2 > r1 && r2 - r1 <= 2
    } yield (i1, i2)).sorted
    assert(got.toSeq == expected.toSeq,
      s"window census mismatch: got ${got.length}, want ${expected.length}")
    assert(got.length == expected.toSet.size, "each pair exactly once")
  }

  test("sortedNeighborhood catches a class-changing typo that phonetic " +
      "blocking misses") {
    import spark.implicits._
    // 'jonsen' → 'jonden': s (class 2) → d (class 3) breaks the
    // phonetic key; sort order keeps them adjacent
    val recs = Seq((1L, "jonsen"), (2L, "jonden"), (3L, "zzz unrelated"))
      .toDF("rec_id", "name")
    val phonetic = EntityResolution.blockedMatches(recs, "rec_id", "name")
      .collect()
    assert(!phonetic.exists(r => r.getLong(1) == 1L && r.getLong(2) == 2L),
      "fixture must defeat the phonetic block")
    val snm = EntityResolution.sortedNeighborhood(recs, "rec_id", "name",
        w = 3, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm.contains((2L, 1L)) || snm.contains((1L, 2L)),
      s"sorted window must catch the pair: $snm")
  }

  test("fellegiSunter: rare-field agreement outweighs common-field " +
      "agreement; verdicts split at both thresholds") {
    import spark.implicits._
    // 20 records, one block. Names: 'ann' ×2 (recs 0,1 — same color),
    // 'bob' ×2 (recs 2,3 — DIFFERENT color), 16 unique. u_name =
    // (4+4+16)/400 = 0.06 → agree weight ≈ log2(0.95/0.06) ≈ 4.0 bits;
    // u_color = 0.5 → agree ≈ +0.93, disagree ≈ −3.32 bits. So:
    // ann-pair ≈ 4.9 bits → match (≥3); bob-pair ≈ 0.66 → possible
    // (≥0, <3); every cross-name pair carries name-disagree ≈ −4.2 →
    // nonmatch regardless of color.
    val names = Seq("ann", "ann", "bob", "bob") ++
      (1 to 16).map(i => s"uniq$i")
    val recs = names.zipWithIndex.map { case (nm, i) =>
      val color =
        if (i <= 2) "red" // ann pair shares red; bob rec 2 red...
        else if (i == 3) "blue" // ...bob rec 3 blue (the disagreement)
        else if (i % 2 == 0) "blue" else "red" // 11 red / 9 blue overall
      (i.toLong, nm, color)
    }.toDF("rec_id", "name", "color").withColumn("bk", lit("x"))
    val out = EntityResolution.fellegiSunter(recs, "rec_id", "bk",
      Seq("name", "color")).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        ((r.getAs[Long]("n_agree"), r.getAs[Long]("score_fp"),
          r.getAs[String]("verdict")))).toMap
    assert(out.size == 190, s"20 choose 2 pairs, got ${out.size}")
    assert(out((0L, 1L))._3 == "match" && out((0L, 1L))._1 == 2L)
    assert(out((2L, 3L))._3 == "possible" && out((2L, 3L))._1 == 1L)
    val rest = out.filterNot(p => p._1 == ((0L, 1L)) || p._1 == ((2L, 3L)))
    assert(rest.values.forall(_._3 == "nonmatch"),
      "name disagreement must dominate any chance-field agreement")
    // agreement on the rare field is worth more than on the common one
    assert(out((0L, 1L))._2 > out((2L, 3L))._2)
  }
}
