package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, language-ID heuristic, content fingerprints. All are
  * pure `org.apache.spark.sql.functions` compositions (codegen'd, no UDFs),
  * so they scale as narrow projections — no shuffle, full pushdown.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  /** Mean token length (chars excluding separators / token count). */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, single symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Heuristic quality score in [0,1]: rewards length (→100 tokens),
    * vocabulary diversity, and word shape (→8-char mean). Deterministic
    * arithmetic only, so it can be oracle-checked.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val divScore = distinctTokenRatio(text)
    val shapeScore = least(avgTokenLength(text) / 8.0, lit(1.0))
    lenScore * 0.4 + divScore * 0.3 + shapeScore * 0.3
  }

  /** Stopword-marker language ID: relative frequency of per-language marker
    * tokens; highest marker density wins, 'und' (undetermined) when no
    * marker clears 1%. N-gram-free variant suited to whitespace languages.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "不")
  )

  def markerDensity(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))
      .cast("double") / size(toks)
  }

  /** Language ID from a PRE-MATERIALIZED token array column. `toks` must be
    * a bound attribute (`.withColumn("_toks", tokens(col("text")))`), not an
    * inline expression: HOF lambdas re-evaluate their closed-over input per
    * element when interpreted (the Dedup.shingles trap — 10× on this query).
    */
  def langIdFromTokens(toks: Column): Column = {
    val densities = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      lang -> size(filter(toks, t => ms.map(m => t === m).reduce(_ || _)))
        .cast("double") / size(toks)
    }
    val best = densities.map { case (lang, d) =>
      struct(d.as("d"), lit(lang).as("lang"))
    }
    val top = greatest(best: _*)
    when(top.getField("d") >= 0.01, top.getField("lang")).otherwise(lit("und"))
  }

  /** Convenience single-column form — only for one-off expressions; bulk
    * paths should materialize tokens and use [[langIdFromTokens]].
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** 64-bit-ish polynomial content fingerprint over characters
    * (acc*31 + codepoint, mod 1e9+7) — the batch analog of a rolling hash,
    * reproducible in any engine.
    */
  def fingerprint(text: Column): Column = {
    val chars = filter(split(text, ""), c => c =!= "")
    aggregate(
      transform(chars, c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L
    )
  }
}
