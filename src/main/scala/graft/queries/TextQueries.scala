package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis._
import graft.util.Tables

/** Text-analysis operators over `documents` with exact DuckDB oracles —
  * every metric is deterministic arithmetic over strings/arrays, rounded
  * where doubles are involved.
  */
object TextQueries extends QueryGroup {

  val defs: Map[String, QueryDef] = Map(

    "q_text_stats" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            length(col("text")).as("n_chars_computed"),
            round(distinctTokenRatio(col("text")), 4).as("distinct_ratio"),
            round(avgTokenLength(col("text")), 4).as("avg_token_len")
          )
          .orderBy("doc_id")
          .limit(2000),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER) AS n_tokens,
             |  CAST(length(text) AS INTEGER) AS n_chars_computed,
             |  round(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> '')))::DOUBLE
             |    / len(list_filter(string_split(text, ' '), t -> t <> '')), 4) AS distinct_ratio,
             |  round(length(replace(text, ' ', ''))::DOUBLE
             |    / len(list_filter(string_split(text, ' '), t -> t <> '')), 4) AS avg_token_len
             |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin)
    ),

    "q_text_quality" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          // floor(x*1e4) not round(): Spark HALF_UP vs DuckDB tie rules
          // disagree on exact .5 ties; floor of the identical double is stable
          .select(col("doc_id"),
            floor(qualityScore(col("text")) * 10000).cast("long").as("quality_bp"))
          .filter(col("quality_bp") >= 5000)
          .orderBy(desc("quality_bp"), col("doc_id"))
          .limit(1000),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             |    length(replace(text, ' ', ''))::DOUBLE AS nosp
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    CAST(floor((least(len(toks)::DOUBLE / 100.0, 1.0) * 0.4
             |      + (len(list_distinct(toks))::DOUBLE / len(toks)) * 0.3
             |      + least((nosp / len(toks)) / 8.0, 1.0) * 0.3) * 10000) AS BIGINT) AS quality_bp
             |  FROM t)
             |SELECT doc_id, quality_bp FROM q WHERE quality_bp >= 5000
             |ORDER BY quality_bp DESC, doc_id LIMIT 1000""".stripMargin)
    ),

    "q_text_langid" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          // tokens bound to a real column first — see langIdFromTokens doc
          .withColumn("_toks", tokens(col("text")))
          .select(col("doc_id"), col("lang").as("labeled"),
            langIdFromTokens(col("_toks")).as("predicted"))
          .groupBy("labeled", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("labeled", "predicted"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, lang,
              |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
              |  FROM documents),
              |dens AS (
              |  SELECT doc_id, lang,
              |    ${TextQueries.langDensitySql}
              |  FROM t),
              |pred AS (
              |  SELECT doc_id, lang AS labeled,
              |    CASE WHEN greatest(d_de, d_en, d_es, d_fr, d_zh) >= 0.01 THEN
              |      CASE greatest(d_de, d_en, d_es, d_fr, d_zh)
              |        WHEN d_zh THEN 'zh' WHEN d_fr THEN 'fr' WHEN d_es THEN 'es'
              |        WHEN d_en THEN 'en' ELSE 'de' END
              |    ELSE 'und' END AS predicted
              |  FROM dens)
              |SELECT labeled, predicted, count(*) AS n FROM pred
              |GROUP BY labeled, predicted ORDER BY labeled, predicted""".stripMargin)
    ),

    "q_text_fingerprint" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
          .limit(1000),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(0::BIGINT,
             |      list_transform(regexp_extract_all(text, '.'), c -> ascii(c)::BIGINT)),
             |    (a, c) -> (a * 31 + c) % 1000000007) AS fp
             |FROM documents ORDER BY doc_id LIMIT 1000""".stripMargin)
    ),

    // Deterministic stratified sampling for corpus balancing: per-language
    // systematic samples keyed on a content hash (not rand(), so any engine
    // reproduces the exact sample — the property a rerunnable 100 TB
    // pipeline needs anyway).
    "q_text_sample_stratified" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        // keep ~1/4 of en (majority class), all of the rest: equalizes mix
        val bucket = pmod(conv(substring(md5(col("text")), 1, 6), 16, 10)
          .cast("long"), lit(4))
        docs.filter(col("lang") =!= "en" || bucket === 0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_sampled,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents
             |WHERE lang <> 'en'
             |   OR CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) % 4 = 0
             |GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    // Dataset mixing: weighted replication (epoch-style upsampling of
    // minority strata) — explode over a per-row weight, no shuffle.
    "q_text_corpus_mix" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val weight = when(col("lang") === "en", 1).otherwise(3)
        docs
          .withColumn("epoch", explode(sequence(lit(1), weight)))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_mixed"),
            countDistinct(col("doc_id")).as("n_unique"),
            sum("n_chars").as("chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_mixed,
             |  count(DISTINCT doc_id) AS n_unique,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents,
             |  unnest(generate_series(1, CASE WHEN lang = 'en' THEN 1 ELSE 3 END))
             |    AS g(epoch)
             |GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    "q_text_bpe_tokens" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .agg(
            sum(bpeTokenCount(col("text"))).as("total_bpe_tokens"),
            sum(tokenCount(col("text"))).as("total_ws_tokens"),
            count(lit(1)).as("n_docs")
          ),
      Some("""SELECT
             |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
             |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_ws_tokens,
             |  count(*) AS n_docs
             |FROM documents""".stripMargin)
    )
  )

  /** CASE-resolution note: the `greatest` tie-break order must match Spark's
    * `greatest(struct(d, lang))` which compares (density, lang) pairs — on a
    * density tie the lexicographically LARGEST lang wins. The DuckDB CASE
    * checks langs in reverse-alphabetical order to replicate that.
    */
  private def langDensitySql: String =
    graft.ops.TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val inList = ms.map(m => s"'${m}'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($inList)))::DOUBLE / len(toks) AS d_$lang"
    }.mkString(",\n    ")
}
