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

  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995 — the
    * merge/purge method): records rank globally by (name, id); every
    * pair within `w` rank positions is a candidate; exact Levenshtein
    * verifies. The complementary generator to [[blockedMatches]]:
    * blocking misses corruptions that change the phonetic CLASS, the
    * sorted window misses corruptions in the first characters — real
    * merge/purge runs multiple passes with different keys; both passes
    * here share the verify kernel and output shape.
    *
    * The global rank is built WITHOUT a global sort: fixed first-char
    * boundaries partition the key domain (a range partition with known
    * split points — no sampled partitioner, so the rank is
    * deterministic and engine-replayable), rank = per-prefix
    * row_number + prefix offset, offsets from one prefix-sized
    * aggregation (alphabet-bounded) cumulated on the driver. Candidate
    * pairs come from a NEIGHBOR-BUCKET equi-join (bucket = rank div w;
    * one side explodes to {b, b−1}), which finds each |Δrank| < w pair
    * exactly once — work is corpus × 2 join rows, never corpus².
    */
  def sortedNeighborhood(
      recs: DataFrame, idCol: String, nameCol: String,
      w: Int = 6, maxDist: Int = 2
  ): DataFrame = {
    require(w >= 2, s"window too small: w=$w")
    val spark = recs.sparkSession
    import spark.implicits._
    val keyed = recs.select(col(idCol).as("rid"), col(nameCol).as("nm"))
      .withColumn("pfx", substring(col("nm"), 1, 1))
    val offsets = {
      val counts = keyed.groupBy("pfx").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      counts.map { case (p, n) => val o = acc; acc += n; (p, o) }
    }
    val offDf = broadcast(offsets.toSeq.toDF("pfx", "off"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("pfx").orderBy("nm", "rid")
    val ranked = graft.util.AutoUnpersist.persistScoped(
      keyed.join(offDf, "pfx")
        .withColumn("rk", row_number().over(wnd).cast("long") + col("off")))
    val l = ranked.select(col("rid").as("id1"), col("nm").as("name1"),
        col("rk").as("r1"))
      .withColumn("bkt", expr(s"r1 div $w"))
    val r = ranked.select(col("rid").as("id2"), col("nm").as("name2"),
        col("rk").as("r2"))
      .withColumn("bkt", explode(array(expr(s"r2 div $w"),
        expr(s"r2 div $w - 1"))))
    l.join(r, "bkt")
      .filter(col("r2") > col("r1") && col("r2") - col("r1") <= w - 1)
      .withColumn("gap", col("r2") - col("r1"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "name1", "name2", "gap", "dist")
  }
}
