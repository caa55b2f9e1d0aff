package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** The reference's build/query/info semantics (SURVEY.md §2: F2, A1-A6, J1,
  * P2-P3, O1-O2, H1/H3, F1) expressed over the driver-blessed corpus:
  * 3-token shingles of `documents.text` act as the wordlist (FIXTURES.md §2
  * — deterministic, no network). Algorithms are limited to md5/sha256 here
  * because those are the two DuckDB can oracle; the other seven are pinned
  * by known-answer ScalaTest vectors and exercised in rows-only queries.
  */
object DedupShared {
  /** tokens → 3-token shingles, exploded; shared by dedup/minhash queries.
    *
    * Two scale-critical details:
    *  - the documents scan is a single small file (one input partition),
    *    but the explode fans out ~50× into md5-heavy stages — fan out
    *    first (conditionally: an already-parallel corpus scan skips the
    *    shuffle, see [[graft.util.Partitioning.fanOut]]);
    *  - the token array is MATERIALIZED as a column before the transform
    *    lambda: a lambda that closes over `split(text)` re-evaluates the
    *    split per element (HOFs are interpreted), which measured ~10×
    *    slower than referencing a bound attribute.
    */
  def shingles(df: DataFrame, extra: Column*): DataFrame = {
    val t = col("_toks")
    graft.util.Partitioning.fanOut(df)
      .withColumn("_toks", split(col("text"), " "))
      .filter(size(t) >= 3)
      .select(
        extra :+ explode(
          transform(sequence(lit(0), size(t) - 3), i =>
            concat_ws(" ",
              element_at(t, i + 1),
              element_at(t, i + 2),
              element_at(t, i + 3)))
        ).as("w"): _*
      )
  }

  /** Matching DuckDB CTE (lateral unnest over generate_series). */
  val shinglesSqlCte: String =
    """toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS w
      |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      |  WHERE len(t) >= 3)""".stripMargin
}

object HashDbQueries extends QueryGroup {
  import DedupShared._

  /** The build pipeline's record expansion (A1 dedup → F2 word×algo fan-out
    * → O1 hash order), hex-encoded for the oracle.
    */
  /** The algorithms the build queries apply (md5/sha256: the two DuckDB can
    * oracle); stats derive counts and the algorithm list from this — the
    * list actually applied — not from a second scan of the built rows.
    */
  private val buildAlgos: Seq[(String, Column => Column)] =
    Seq("md5" -> (w => md5(w)), "sha256" -> (w => sha2(w, 256)))

  private def hashdb(s: SparkSession, d: String): DataFrame = {
    val words = shingles(Tables.documents(s, d)).select("w").distinct()
    val perAlgo = buildAlgos.map { case (n, f) => n -> f(col("w")) }
    words.select(
      explode(array(perAlgo.map { case (name, h) =>
        struct(h.as("hash_hex"), col("w").as("preimage"), lit(name).as("algorithm"))
      }: _*)).as("r")
    ).select("r.hash_hex", "r.preimage", "r.algorithm")
  }

  private val hashdbSqlCte: String =
    s"""WITH $shinglesSqlCte,
       |words AS (SELECT DISTINCT w FROM sh),
       |hashdb AS (
       |  SELECT md5(w) AS hash_hex, w AS preimage, 'md5' AS algorithm FROM words
       |  UNION ALL
       |  SELECT sha256(w) AS hash_hex, w AS preimage, 'sha256' AS algorithm FROM words)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Mask-attack candidate generation + hash: ?l?l?d expands to 6,760
    // synthetic words as a pure codegen projection over spark.range
    // (stride arithmetic per position — no input data, no shuffle, no
    // driver materialization; a 10^10 mask streams the same way), then
    // the md5 build summary with an order-free checksum. DuckDB replays
    // the range decode and the hashing verbatim.
    "q_hashdb_mask_build" -> QueryDef(
      (s, _) => {
        val words = graft.sources.MaskSource.expand(s, "?l?l?d")
        words.select(col("word"), md5(col("word")).as("h"))
          .agg(
            count(lit(1)).as("n_candidates"),
            countDistinct(col("h")).as("n_distinct"),
            sum(conv(substring(col("h"), 1, 12), 16, 10).cast("long"))
              .as("hash_checksum"),
            min("word").as("first_word"),
            max("word").as("last_word"))
      },
      Some("""WITH ids AS (SELECT range AS id FROM range(0, 6760)),
             |words AS (
             |  SELECT substr('abcdefghijklmnopqrstuvwxyz',
             |      CAST(id // 260 % 26 AS INT) + 1, 1)
             |    || substr('abcdefghijklmnopqrstuvwxyz',
             |      CAST(id // 10 % 26 AS INT) + 1, 1)
             |    || substr('0123456789', CAST(id % 10 AS INT) + 1, 1)
             |    AS word
             |  FROM ids),
             |hashed AS (SELECT word, md5(word) AS h FROM words)
             |SELECT count(*) AS n_candidates,
             |  count(DISTINCT h) AS n_distinct,
             |  CAST(sum(CAST(('0x' || substring(h, 1, 12)) AS BIGINT))
             |    AS BIGINT) AS hash_checksum,
             |  min(word) AS first_word, max(word) AS last_word
             |FROM hashed""".stripMargin)
    ),

    // Build pipeline output, limited by hash order (also covers O1+O2).
    "q_hashdb_build" -> QueryDef(
      (s, d) =>
        hashdb(s, d).orderBy("hash_hex", "algorithm").limit(500),
      Some(s"""$hashdbSqlCte
              |SELECT hash_hex, preimage, algorithm FROM hashdb
              |ORDER BY hash_hex, algorithm LIMIT 500""".stripMargin)
    ),

    // A6: dry-run stats — total words, unique words, records = unique × #algos.
    "q_hashdb_dryrun" -> QueryDef(
      (s, d) =>
        shingles(Tables.documents(s, d)).agg(
          count(lit(1)).as("total_words"),
          countDistinct(col("w")).as("unique_words"),
          (countDistinct(col("w")) * 2).as("total_records")
        ),
      Some(s"""WITH $shinglesSqlCte
              |SELECT count(*) AS total_words, count(DISTINCT w) AS unique_words,
              |  count(DISTINCT w) * 2 AS total_records
              |FROM sh""".stripMargin)
    ),

    // P2: hex prefix reverse lookup over the built db.
    "q_hashdb_prefix" -> QueryDef(
      (s, d) =>
        hashdb(s, d)
          .filter(col("hash_hex").startsWith("00"))
          .orderBy("hash_hex", "algorithm"),
      Some(s"""$hashdbSqlCte
              |SELECT hash_hex, preimage, algorithm FROM hashdb
              |WHERE starts_with(hash_hex, '00')
              |ORDER BY hash_hex, algorithm""".stripMargin)
    ),

    // P2 full-length + P3: exact digest equality with an algorithm filter.
    "q_hashdb_exact" -> QueryDef(
      (s, d) =>
        hashdb(s, d)
          .filter(col("hash_hex") === md5(lit("slow hash batch")) && col("algorithm") === "md5")
          .select("preimage", "algorithm"),
      Some(s"""$hashdbSqlCte
              |SELECT preimage, algorithm FROM hashdb
              |WHERE hash_hex = md5('slow hash batch') AND algorithm = 'md5'""".stripMargin)
    ),

    // Bulk reverse lookup: a probe TABLE of hashes joined against the db —
    // the Spark-scale generalization of the reference's one-hash query
    // loop (a driver loop of point lookups would pay the per-job floor per
    // hash; one broadcast equi-join answers the whole batch in a single
    // pass, with the bloom/min-max pruning still applying per file).
    "q_hashdb_batch_lookup" -> QueryDef(
      (s, d) => {
        val probes = shingles(Tables.documents(s, d).filter(col("doc_id") < 5))
          .select(md5(col("w")).as("hash_hex")).distinct()
        hashdb(s, d)
          .join(broadcast(probes), Seq("hash_hex"))
          .filter(col("algorithm") === "md5")
          .select("hash_hex", "preimage", "algorithm")
          .orderBy("hash_hex")
      },
      Some(s"""$hashdbSqlCte,
              |probes AS (
              |  SELECT DISTINCT md5(w) AS hash_hex FROM sh WHERE doc_id < 5)
              |SELECT h.hash_hex, h.preimage, h.algorithm
              |FROM hashdb h JOIN probes p ON h.hash_hex = p.hash_hex
              |WHERE h.algorithm = 'md5' ORDER BY h.hash_hex""".stripMargin)
    ),

    // J1: append-merge provenance — per (word, algorithm) record, the
    // set-union of contributing sources, deterministic (sorted, csv).
    "q_hashdb_merge_sources" -> QueryDef(
      (s, d) =>
        // n_sources derives from the collected set: countDistinct alongside
        // collect_set would add an expand + second shuffle for nothing
        shingles(Tables.documents(s, d), col("source"))
          .groupBy("w")
          .agg(array_sort(collect_set(col("source"))).as("src_set"))
          .select(col("w"), array_join(col("src_set"), ",").as("sources"),
            size(col("src_set")).cast("long").as("n_sources"))
          .filter(col("n_sources") >= 5) // words present in ≥5 distinct sources
          .select(md5(col("w")).as("hash_hex"), col("w").as("preimage"),
            col("sources"), col("n_sources"))
          .orderBy("hash_hex"),
      Some(s"""WITH $shinglesSqlCte,
              |merged AS (
              |  SELECT w, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
              |    count(DISTINCT source) AS n_sources
              |  FROM sh GROUP BY w HAVING count(DISTINCT source) >= 5)
              |SELECT md5(w) AS hash_hex, w AS preimage, sources, n_sources
              |FROM merged ORDER BY hash_hex""".stripMargin)
    ),

    // H1-H9 full registry through the codegen Digest expression, fully
    // value-oracled despite DuckDB lacking keccak256/blake3/ripemd160/
    // sha1/sha512, via two complementary gates in ONE result set:
    //  - registry rows: the reference's own published vectors
    //    (tests/integration.rs:8-96 "hello" across all 9 algorithms,
    //    README.md "password"/sha256) as literal rows in the oracle —
    //    every algorithm's digest flows through the actual plan and is
    //    compared against an independently published value;
    //  - corpus rows: 200 SF-dependent shingle words × the two algorithms
    //    DuckDB recomputes (md5/sha256) — gating the data path (shingle,
    //    dedup, deterministic selection, hex casing) at any scale factor.
    // Word selection orders by md5(w), not w: hex ordering is binary-
    // collation-safe in both engines, raw UTF-8 text ordering is not.
    "q_hashdb_all_algos" -> QueryDef(
      (s, d) => {
        import graft.sql.functions.digestHex
        def rows(words: DataFrame, algos: Seq[String]) =
          words.select(
            explode(array(algos.map { a =>
              struct(lit(a).as("algorithm"), digestHex(a, col("w")).as("hash_hex"),
                col("w").as("preimage"))
            }: _*)).as("r"))
            .select("r.algorithm", "r.hash_hex", "r.preimage")
        import s.implicits._
        val registry = rows(Seq("hello").toDF("w"), graft.core.Hashers.names)
          .union(rows(Seq("password").toDF("w"), Seq("sha256")))
        val corpus = shingles(Tables.documents(s, d)).select("w").distinct()
          .orderBy(md5(col("w"))).limit(200)
        registry.union(rows(corpus, Seq("md5", "sha256")))
          .orderBy("algorithm", "hash_hex")
      },
      Some(s"""WITH $shinglesSqlCte,
              |words AS (SELECT DISTINCT w FROM sh ORDER BY md5(w) LIMIT 200),
              |corpus AS (
              |  SELECT 'md5' AS algorithm, md5(w) AS hash_hex, w AS preimage
              |  FROM words
              |  UNION ALL
              |  SELECT 'sha256', sha256(w), w FROM words),
              |kat(algorithm, hash_hex, preimage) AS (VALUES
              |  ('md5', '5d41402abc4b2a76b9719d911017c592', 'hello'),
              |  ('sha1', 'aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d', 'hello'),
              |  ('sha256', '2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824', 'hello'),
              |  ('sha512', '9b71d224bd62f3785d96d46ad3ea3d73319bfbc2890caadae2dff72519673ca72323c3d99ba5c11d7c7acc6e14b8c5da0c4663475c2e5c3adef46f73bcdec043', 'hello'),
              |  ('hash160', 'b6a9c8c230722b7c748331a8b450f05566dc7d0f', 'hello'),
              |  ('hash256', '9595c9df90075148eb06860365df33584b75bff782a510c6cd4883a419833d50', 'hello'),
              |  ('keccak256', '1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8', 'hello'),
              |  ('blake3', 'ea8f163db38682925e4491c5e58d4bb3506ef8c14eb78a86e908c5624a67200f', 'hello'),
              |  ('ripemd160', '108f07b8382412612c048d07d13f814118445acd', 'hello'),
              |  ('sha256', '5e884898da28047151d0e56f8dc6292773603d0d6aabbdd62a11ef721d1542d8', 'password'))
              |SELECT algorithm, hash_hex, preimage FROM kat
              |UNION ALL
              |SELECT algorithm, hash_hex, preimage FROM corpus
              |ORDER BY algorithm, hash_hex""".stripMargin)
    ),

    // A3-A5: info stats — records, algorithms, sources, all from ONE shingle
    // pass: total_records = distinct words × #algorithms (each word fans out
    // to exactly one record per algorithm — the identity q_hashdb_dryrun
    // already relies on), algorithms is the applied list itself, sources a
    // collect_set over the same frame. A previous formulation ran the full
    // build pipeline AND a second shingle scan, then crossJoined the two
    // 1-row aggregates — its duplicated giant plan cost ~13 s of
    // whole-stage-codegen compilation per session (driver bench r2).
    "q_hashdb_stats" -> QueryDef(
      (s, d) =>
        shingles(Tables.documents(s, d), col("source")).agg(
          (countDistinct(col("w")) * buildAlgos.size).as("total_records"),
          lit(buildAlgos.map(_._1).sorted.mkString(",")).as("algorithms"),
          array_join(array_sort(collect_set(col("source"))), ",").as("sources")
        ),
      Some(s"""$hashdbSqlCte,
              |dbstats AS (
              |  SELECT count(*) AS total_records,
              |    string_agg(DISTINCT algorithm, ',' ORDER BY algorithm)
              |      AS algorithms
              |  FROM hashdb),
              |srcstats AS (
              |  SELECT string_agg(DISTINCT source, ',' ORDER BY source) AS sources
              |  FROM sh)
              |SELECT total_records, algorithms, sources
              |FROM dbstats, srcstats""".stripMargin)
    )
  )
}
