package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) via phonetic blocking — the
  * classic dedup shape for NAME-like keys, where MinHash/LSH shingles
  * are the wrong granularity: "jonsen"/"jonson" share almost no
  * 5-gram shingles but one phonetic block. Candidates come from an
  * equi-join on a Soundex-class key (first letter + the first three
  * collapsed consonant-class digits), verification is exact
  * Levenshtein on the candidate pairs only — the third candidate-
  * generation family in this library next to banded LSH (minhash/
  * simhash/phash) and inverted-index rarity (ngram/containment).
  *
  * Scale shape: the key is a pure codegen projection (translate + six
  * run-collapse regexes — the backreference-free Java∩RE2 subset);
  * candidates are one equi-shuffle on the key; the edit-distance
  * kernel runs on candidates only, never corpus². Phonetic blocks are
  * the op's skew mode (common names make hot keys) — at corpus scale
  * the same bucket-cap/salting guards the LSH family uses apply, and
  * composite keys (phonetic × birth-year-style second attribute)
  * shrink blocks multiplicatively.
  */
object EntityResolution {

  /** Soundex-class consonant mapping: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5
    * R→6; vowels, H, W, Y and spaces drop (translate removes source
    * chars with no target).
    */
  private val PhoneticSrc = "BFPVCGJKQSXZDTLMNRAEIOUYHW "
  private val PhoneticDst = "111122222222334556"

  /** Blocking key: first letter + first 3 run-collapsed class digits of
    * the rest, zero-padded — a simplified (whole-tail, cross-vowel
    * collapsing) Soundex-class key. Deterministic, engine-replayable:
    * upper/translate/rpad plus six single-digit run collapses.
    */
  def phoneticKey(name: Column): Column = {
    val u = upper(name)
    val coded = regexp_replace(
      translate(u.substr(lit(2), length(u)), PhoneticSrc, PhoneticDst),
      "[^1-6]", "")  // translate keeps unmapped chars (punct, digits)
    val collapsed = (1 to 6).foldLeft(coded) { (c, d) =>
      regexp_replace(c, s"$d$d+", s"$d")
    }
    concat(u.substr(lit(1), lit(1)), rpad(substring(collapsed, 1, 3), 3, "0"))
  }

  /** All record pairs (id1 < id2) sharing a phonetic block whose names
    * are within `maxDist` edits: (pkey, id1, id2, name1, name2, dist).
    */
  def blockedMatches(
      recs: DataFrame, idCol: String, nameCol: String, maxDist: Int = 2
  ): DataFrame = {
    val keyed = recs.select(col(idCol), col(nameCol),
      phoneticKey(col(nameCol)).as("pkey"))
    val a = keyed.select(col("pkey"), col(idCol).as("id1"),
      col(nameCol).as("name1"))
    val b = keyed.select(col("pkey"), col(idCol).as("id2"),
      col(nameCol).as("name2"))
    a.join(b, Seq("pkey"))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }
}
