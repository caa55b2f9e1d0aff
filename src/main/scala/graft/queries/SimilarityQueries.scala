package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.util.Tables

/** Similarity search over `embeddings` (array<float>, 64-dim). Every
  * query here is value-checked bit-exactly against DuckDB (identical
  * left-to-right double arithmetic, floor-bp scores); the LSH and IVF
  * oracles replay the full index — md5-parity hyperplanes / first-N
  * centroids are engine-portable by construction.
  */
object SimilarityQueries extends QueryGroup {

  /** Lloyd rounds for the oracled IVF query (seed = first 16 by vec_id). */
  private val IvfLloydIters = 3

  /** CTE chain replaying [[Similarity.kmeansCentroids]] in DuckDB:
    * `cents0` (first-16 seed, cast to double) and, per round k,
    * `score{k}` (cos against cents{k}), `asg{k}` (argmax cell, ties to the
    * higher cell), `newc{k}` (per cell×dim ordered-fold mean), and
    * `cents{k+1}` (new centroids; member-less cells keep the old one).
    * Ends with `score{iters}` — assignment/probes against the final
    * centroids.
    */
  private def kmeansCentsCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """cents0 AS (
             |  SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
             |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16))""".stripMargin
    def score(k: Int): String =
      s"""score$k AS (
         |  SELECT e.vec_id, c.cell,
         |    list_reduce(list_transform(generate_series(1, len(e.embedding)),
         |        x -> e.embedding[x]::DOUBLE * c.cv[x]), (s, v) -> s + v)
         |      / sqrt(list_reduce(list_transform(generate_series(1, len(c.cv)),
         |        x -> c.cv[x] * c.cv[x]), (s, v) -> s + v)) AS s
         |  FROM embeddings e, cents$k c)""".stripMargin
    for (k <- 0 until iters) {
      sb ++= ",\n" + score(k) + ",\n"
      sb ++=
        s"""asg$k AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY s DESC, cell DESC) AS rn
           |    FROM score$k) WHERE rn = 1),
           |newc$k AS (
           |  SELECT a.cell, d.dim,
           |    CAST(sum(CAST(floor(e.embedding[d.dim]::DOUBLE * 1000000.0)
           |      AS BIGINT)) AS BIGINT) AS sq,
           |    count(*) AS n
           |  FROM asg$k a JOIN embeddings e ON e.vec_id = a.vec_id,
           |       (SELECT unnest(generate_series(1, 64)) AS dim) d
           |  GROUP BY a.cell, d.dim),
           |cents${k + 1} AS (
           |  SELECT cell,
           |    list(CAST(sq // n AS BIGINT) / 1000000.0 ORDER BY dim) AS cv
           |  FROM newc$k GROUP BY cell
           |  UNION ALL
           |  SELECT cell, cv FROM cents$k
           |  WHERE cell NOT IN (SELECT cell FROM newc$k))""".stripMargin
    }
    sb ++= ",\n" + score(iters)
    sb.toString
  }

  /** CTE chain replaying one PQ subspace in DuckDB: the sliced sub-vector
    * view, the first-k seed, `iters` Lloyd rounds (same fixed-point means
    * as [[kmeansCentsCtes]], just `len`-dim), the final code assignment,
    * and the per-query ADC lookup-table entries (⌊dot·10⁶⌋ per codeword).
    */
  private def pqSubCtes(s: Int, start1: Int, len: Int, k: Int,
      iters: Int, queryPred: String): String = {
    val sb = new StringBuilder
    sb ++=
      s"""sub$s AS (
         |  SELECT vec_id, list_transform(
         |      list_slice(embedding, $start1, ${start1 + len - 1}),
         |      x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |s${s}_cents0 AS (
         |  SELECT vec_id AS cell, v AS cv
         |  FROM (SELECT vec_id, v FROM sub$s ORDER BY vec_id LIMIT $k))""".stripMargin
    def score(j: Int): String =
      s"""s${s}_score$j AS (
         |  SELECT e.vec_id, c.cell,
         |    list_reduce(list_transform(generate_series(1, $len),
         |        x -> e.v[x] * c.cv[x]), (a, b) -> a + b)
         |      / sqrt(list_reduce(list_transform(generate_series(1, $len),
         |        x -> c.cv[x] * c.cv[x]), (a, b) -> a + b)) AS s
         |  FROM sub$s e, s${s}_cents$j c)""".stripMargin
    for (j <- 0 until iters) {
      sb ++= ",\n" + score(j) + ",\n"
      sb ++=
        s"""s${s}_asg$j AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY s DESC, cell DESC) AS rn
           |    FROM s${s}_score$j) WHERE rn = 1),
           |s${s}_newc$j AS (
           |  SELECT a.cell, d.dim,
           |    CAST(sum(CAST(floor(e.v[d.dim] * 1000000.0) AS BIGINT))
           |      AS BIGINT) AS sq,
           |    count(*) AS n
           |  FROM s${s}_asg$j a JOIN sub$s e ON e.vec_id = a.vec_id,
           |       (SELECT unnest(generate_series(1, $len)) AS dim) d
           |  GROUP BY a.cell, d.dim),
           |s${s}_cents${j + 1} AS (
           |  SELECT cell,
           |    list(CAST(sq // n AS BIGINT) / 1000000.0 ORDER BY dim) AS cv
           |  FROM s${s}_newc$j GROUP BY cell
           |  UNION ALL
           |  SELECT cell, cv FROM s${s}_cents$j
           |  WHERE cell NOT IN (SELECT cell FROM s${s}_newc$j))""".stripMargin
    }
    sb ++= ",\n" + score(iters) + ",\n"
    sb ++=
      s"""s${s}_enc AS (
         |  SELECT vec_id, $s AS sub, cell AS code FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY s DESC, cell DESC) AS rn
         |    FROM s${s}_score$iters) WHERE rn = 1),
         |s${s}_lut AS (
         |  SELECT q.vec_id AS query_id, $s AS sub, c.cell AS code,
         |    CAST(floor(list_reduce(list_transform(generate_series(1, $len),
         |        x -> q.v[x] * c.cv[x]), (a, b) -> a + b) * 1000000.0)
         |      AS BIGINT) AS lut
         |  FROM (SELECT vec_id, v FROM sub$s WHERE $queryPred) q,
         |       s${s}_cents$iters c)""".stripMargin
    sb.toString
  }

  /** CTE chain replaying [[Similarity.pcaTopProjection]]: fixed-point
    * means, the n-divided integer covariance, `iters` power-iteration
    * rounds (order-free BIGINT matvec + dim-ordered norm fold), and the
    * per-vector micro-unit projection.
    */
  private def pcaCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """means AS (
        |  SELECT d.i AS i,
        |    (CAST(sum(CAST(floor(e.embedding[d.i]::DOUBLE * 1000000.0)
        |      AS BIGINT)) AS BIGINT) // count(*)) / 1000000.0 AS mu
        |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) d
        |  GROUP BY d.i),
        |cov AS (
        |  SELECT di.i AS i, dj.i AS j,
        |    CAST(sum(CAST(floor((e.embedding[di.i]::DOUBLE - mi.mu)
        |      * (e.embedding[dj.i]::DOUBLE - mj.mu) * 1000000.0)
        |      AS BIGINT)) AS BIGINT) // count(*) AS c
        |  FROM embeddings e,
        |       (SELECT unnest(generate_series(1, 64)) AS i) di,
        |       (SELECT unnest(generate_series(1, 64)) AS i) dj,
        |       means mi, means mj
        |  WHERE mi.i = di.i AND mj.i = dj.i
        |  GROUP BY di.i, dj.i),
        |x0 AS (SELECT unnest(generate_series(1, 64)) AS i, 0.125 AS x)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= ",\n" +
        s"""y$t AS (
           |  SELECT c.i, CAST(sum(CAST(floor(c.c * p.x) AS BIGINT))
           |    AS BIGINT) AS y
           |  FROM cov c JOIN x${t - 1} p ON p.i = c.j GROUP BY c.i),
           |x$t AS (
           |  SELECT i, (y / 1000000.0) / sqrt((
           |    SELECT list_reduce(
           |      list_prepend(0.0, list(y / 1000000.0 ORDER BY i)),
           |      (a, b) -> a + b * b) FROM y$t)) AS x
           |  FROM y$t)""".stripMargin
    }
    sb ++= ",\n" +
      s"""proj AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CAST(floor((e.embedding[d.i]::DOUBLE - m.mu)
         |      * xx.x * 1000000.0) AS BIGINT)) AS BIGINT) AS proj_micro
         |  FROM embeddings e,
         |       (SELECT unnest(generate_series(1, 64)) AS i) d,
         |       means m, x$iters xx
         |  WHERE m.i = d.i AND xx.i = d.i
         |  GROUP BY e.vec_id)""".stripMargin
    sb.toString
  }

  private val cosineSql: String =
    """list_reduce(list_transform(generate_series(1, len(q.embedding)),
      |      x -> q.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)
      |  / (sqrt(list_reduce(list_transform(generate_series(1, len(q.embedding)),
      |        x -> q.embedding[x]::DOUBLE * q.embedding[x]::DOUBLE), (s, v) -> s + v))
      |   * sqrt(list_reduce(list_transform(generate_series(1, len(c.embedding)),
      |        x -> c.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)))""".stripMargin

  /** [[cosineSql]] over only the first `n` dimensions — the DuckDB
    * replay of a matryoshka `slice(embedding, 1, n)` truncation (same
    * sequential DOUBLE fold order as FloatVecDot on the sliced array).
    */
  private def cosineSqlDims(n: Int): String =
    s"""list_reduce(list_transform(generate_series(1, $n),
       |      x -> q.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)
       |  / (sqrt(list_reduce(list_transform(generate_series(1, $n),
       |        x -> q.embedding[x]::DOUBLE * q.embedding[x]::DOUBLE), (s, v) -> s + v))
       |   * sqrt(list_reduce(list_transform(generate_series(1, $n),
       |        x -> c.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)))""".stripMargin

  /** Unrolled MMR greedy rounds (DuckDB replay of
    * [[graft.ops.Similarity.mmrRerank]]): expects CTEs `cand`
    * (query_id, cand_id, cos_bp) and `sims` (query_id, i, j, sim_bp)
    * upstream; emits sel1..selK and the running union selallK.
    */
  private def mmrRoundsCtes(kOut: Int, lambdaBp: Long): String = {
    val inv = 10000L - lambdaBp
    val sb = new StringBuilder
    sb ++=
      s"""sel1 AS (
         |  SELECT query_id, 1 AS mmr_rank, cand_id, cos_bp,
         |    $lambdaBp * cos_bp AS mmr_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY $lambdaBp * cos_bp DESC, cand_id) AS rn
         |        FROM cand) WHERE rn = 1),
         |selall1 AS (SELECT * FROM sel1)""".stripMargin
    for (r <- 2 to kOut) {
      sb ++= ",\n" +
        s"""pen$r AS (
           |  SELECT s.query_id, s.i AS cand_id, max(s.sim_bp) AS mx
           |  FROM sims s JOIN selall${r - 1} t
           |    ON t.query_id = s.query_id AND t.cand_id = s.j
           |  GROUP BY 1, 2),
           |sel$r AS (
           |  SELECT query_id, $r AS mmr_rank, cand_id, cos_bp, mmr_u FROM (
           |    SELECT r.query_id, r.cand_id, r.cos_bp,
           |      $lambdaBp * r.cos_bp - $inv * coalesce(p.mx, 0) AS mmr_u,
           |      row_number() OVER (PARTITION BY r.query_id
           |        ORDER BY $lambdaBp * r.cos_bp
           |          - $inv * coalesce(p.mx, 0) DESC, r.cand_id) AS rn
           |    FROM (SELECT c.* FROM cand c LEFT JOIN selall${r - 1} s
           |          ON s.query_id = c.query_id AND s.cand_id = c.cand_id
           |          WHERE s.cand_id IS NULL) r
           |    LEFT JOIN pen$r p
           |      ON p.query_id = r.query_id AND p.cand_id = r.cand_id)
           |  WHERE rn = 1),
           |selall$r AS (SELECT * FROM selall${r - 1}
           |             UNION ALL SELECT * FROM sel$r)""".stripMargin
    }
    sb.toString
  }

  /** Unrolled k-center greedy rounds (DuckDB replay of
    * [[graft.ops.Similarity.kCenterCoreset]]): each round scores every
    * unpicked vector's max cosine to the picked set and takes the argmin
    * (ties to the lower id). Uses `$cosineSql`'s q/c aliases.
    */
  private def kcenterRoundsCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """sel1 AS (SELECT 1 AS round, min(vec_id) AS vid,
        |  CAST(NULL AS BIGINT) AS cover_bp FROM embeddings),
        |selall1 AS (SELECT * FROM sel1)""".stripMargin
    for (r <- 2 to k) {
      sb ++= ",\n" +
        s"""mc$r AS (
           |  SELECT q.vec_id,
           |    CAST(floor(greatest(-1.0, max($cosineSql)) * 10000)
           |      AS BIGINT) AS mc_bp
           |  FROM embeddings q
           |  JOIN embeddings c
           |    ON c.vec_id IN (SELECT vid FROM selall${r - 1})
           |  WHERE q.vec_id NOT IN (SELECT vid FROM selall${r - 1})
           |  GROUP BY q.vec_id),
           |sel$r AS (
           |  SELECT $r AS round, vec_id AS vid, mc_bp AS cover_bp
           |  FROM (SELECT *, row_number() OVER (ORDER BY mc_bp ASC,
           |          vec_id ASC) AS rn FROM mc$r)
           |  WHERE rn = 1),
           |selall$r AS (SELECT * FROM selall${r - 1}
           |             UNION ALL SELECT * FROM sel$r)""".stripMargin
    }
    sb.toString
  }

  val defs: Map[String, QueryDef] = Map(

    // Symmetric int8 scalar quantization (the PQ-style memory-shrink
    // step): per-vector scale, reconstruction MSE, code summary scalars.
    // Pure projection — both engines fold left-to-right in double.
    "q_sim_quantize" -> QueryDef(
      (s, d) =>
        Similarity.quantizeInt8(Tables.embeddings(s, d)).orderBy("vec_id"),
      Some("""WITH q AS (
             |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |  FROM embeddings),
             |m AS (
             |  SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) AS maxabs FROM q),
             |s AS (
             |  SELECT vec_id, v,
             |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale
             |  FROM m),
             |c AS (
             |  SELECT vec_id, v, scale,
             |    list_transform(v, x -> CAST(floor(x * scale) AS INTEGER)) AS codes
             |  FROM s)
             |SELECT vec_id, scale,
             |  list_reduce(list_transform(generate_series(1, len(v)),
             |      i -> (v[i] - (CASE WHEN scale > 0 THEN codes[i]::DOUBLE / scale ELSE 0.0 END))
             |         * (v[i] - (CASE WHEN scale > 0 THEN codes[i]::DOUBLE / scale ELSE 0.0 END))),
             |    (a, b) -> a + b) / len(v) AS mse,
             |  CAST(list_reduce(codes, (a, b) -> a + b) AS BIGINT) AS code_sum,
             |  list_min(codes) AS code_min,
             |  list_max(codes) AS code_max
             |FROM c ORDER BY vec_id""".stripMargin)
    ),

    // Approximate k-NN over the int8-quantized corpus: integer code dot
    // products (exact in float), rescaled — 4× less memory per vector.
    "q_sim_quantized_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.quantizedTopK(e.filter(col("vec_id") < 10), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some("""WITH base AS (
             |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |qz AS (
             |  SELECT vec_id, v, CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale
             |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM base)),
             |codes AS (
             |  SELECT vec_id, scale, list_transform(v, x -> CAST(floor(x * scale) AS INTEGER)) AS c
             |  FROM qz),
             |normed AS (
             |  SELECT vec_id, scale, c,
             |    CASE WHEN scale > 0
             |      THEN sqrt(list_reduce(list_transform(c, x -> x * x), (a, b) -> a + b)::DOUBLE) / scale
             |      ELSE 0.0 END AS nrm
             |  FROM codes),
             |scored AS (
             |  SELECT q.vec_id AS query_id, t.vec_id AS cand_id,
             |    CAST(floor(((list_reduce(list_transform(generate_series(1, len(q.c)),
             |        i -> q.c[i] * t.c[i]), (a, b) -> a + b)::DOUBLE
             |      / (q.scale * t.scale)) / (q.nrm * t.nrm)) * 10000) AS BIGINT) AS acos_bp
             |  FROM normed q JOIN normed t ON q.vec_id <> t.vec_id
             |  WHERE q.vec_id < 10),
             |ranked AS (
             |  SELECT query_id, cand_id, acos_bp,
             |    row_number() OVER (PARTITION BY query_id ORDER BY acos_bp DESC, cand_id) AS rank_raw
             |  FROM scored)
             |SELECT query_id, cand_id, acos_bp, CAST(rank_raw AS INTEGER) AS rank
             |FROM ranked WHERE rank_raw <= 5 ORDER BY query_id, rank""".stripMargin)
    ),

    // Exact k-NN: top-5 cosine neighbors for the first 10 vectors.
    // Hybrid lexical+dense retrieval fused by reciprocal rank (RRF,
    // Cormack et al. 2009): the BM25 run over documents and the cosine
    // run over the aligned embeddings merge on 10^12 div (60+rank)
    // fixed-point contributions — no cross-scale score normalization,
    // exact integer fusion both engines replay.
    "q_sim_hybrid_rrf" -> QueryDef(
      (s, d) => {
        import graft.ops.Retrieval
        val e = Tables.embeddings(s, d)
        val lex = Retrieval.bm25(Tables.documents(s, d),
            terms = Seq("slow", "hash", "batch"))
          .select(lit(0L).as("query_id"), col("doc_id").as("id"),
            col("score_micro").as("score"))
        val dense = Similarity.bruteForceTopK(
            e.filter(col("vec_id") === 0), e, k = 50)
          .select(col("query_id"), col("cand_id").as("id"),
            col("cos_bp").as("score"))
        Retrieval.rrfFuse(Seq(lex, dense), k = 60, topK = 20)
          .orderBy("rank")
      },
      Some(s"""WITH lens AS (
              |  SELECT doc_id,
              |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              |      AS BIGINT) AS dl
              |  FROM documents),
              |stats AS (
              |  SELECT count(*) AS n_docs,
              |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
              |toks AS (
              |  SELECT doc_id,
              |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
              |  FROM documents),
              |tf AS (
              |  SELECT doc_id, tok, count(*) AS tf FROM toks
              |  WHERE tok IN ('slow', 'hash', 'batch') GROUP BY 1, 2),
              |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
              |lexscore AS (
              |  SELECT tf.doc_id,
              |    CAST(sum(CAST(floor(1000000.0
              |      * ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
              |      * (tf * (1.2 + 1.0))
              |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
              |      AS BIGINT)) AS BIGINT) AS score
              |  FROM tf JOIN df USING (tok) JOIN lens USING (doc_id)
              |  CROSS JOIN stats GROUP BY tf.doc_id),
              |densescore AS (
              |  SELECT c.vec_id AS id,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS score
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id = 0),
              |lexrank AS (
              |  SELECT CAST(0 AS BIGINT) AS query_id, doc_id AS id,
              |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
              |  FROM lexscore),
              |denserank AS (
              |  SELECT CAST(0 AS BIGINT) AS query_id, id,
              |    row_number() OVER (ORDER BY score DESC, id) AS rank
              |  FROM densescore QUALIFY rank <= 50),
              |contrib AS (
              |  SELECT query_id, id, 1000000000000 // (60 + rank) AS c
              |  FROM (SELECT * FROM lexrank UNION ALL SELECT * FROM denserank)),
              |fused AS (
              |  SELECT query_id, id, count(*) AS n_runs,
              |    CAST(sum(c) AS BIGINT) AS rrf_pico
              |  FROM contrib GROUP BY 1, 2)
              |SELECT * FROM (
              |  SELECT query_id, id, n_runs, rrf_pico,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY rrf_pico DESC, n_runs DESC, id) AS INTEGER) AS rank
              |  FROM fused)
              |WHERE rank <= 20 ORDER BY rank""".stripMargin)
    ),

    "q_sim_topk_bruteforce" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH scored AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 10),
              |ranked AS (
              |  SELECT query_id, cand_id, cos_bp,
              |    row_number() OVER (PARTITION BY query_id
              |                       ORDER BY cos_bp DESC, cand_id)
              |      AS rank_raw
              |  FROM scored)
              |SELECT query_id, cand_id, cos_bp,
              |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
              |WHERE rank_raw <= 5 ORDER BY query_id, rank""".stripMargin)
    ),

    // Matryoshka truncation audit: top-5 agreement between full 64-dim
    // and first-16-dim cosine retrieval for 20 queries — overlap@5 and
    // top-1 retention per query. Both rankings replay exactly (same
    // fold-order DOUBLE cosine, same floor-bp + cand_id tie-break).
    "q_sim_matryoshka" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.matryoshkaAgreement(
            e.filter(col("vec_id") < 20), e, k = 5, dTrunc = 16)
          .orderBy("query_id")
      },
      Some(s"""WITH fulls AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20),
              |ft AS (
              |  SELECT query_id, cand_id, r FROM (
              |    SELECT query_id, cand_id,
              |      row_number() OVER (PARTITION BY query_id
              |                         ORDER BY cos_bp DESC, cand_id) AS r
              |    FROM fulls) WHERE r <= 5),
              |truncs AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST(floor((${cosineSqlDims(16)}) * 10000) AS BIGINT)
              |      AS cos_bp
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20),
              |tt AS (
              |  SELECT query_id, cand_id FROM (
              |    SELECT query_id, cand_id,
              |      row_number() OVER (PARTITION BY query_id
              |                         ORDER BY cos_bp DESC, cand_id) AS r
              |    FROM truncs) WHERE r <= 5)
              |SELECT ft.query_id,
              |  CAST(count(tt.cand_id) AS BIGINT) AS overlap,
              |  CAST(count(tt.cand_id) AS BIGINT) * 10000 // 5
              |    AS overlap_bp,
              |  CAST(max(CASE WHEN ft.r = 1 AND tt.cand_id IS NOT NULL
              |    THEN 1 ELSE 0 END) AS BIGINT) AS top1_kept
              |FROM ft LEFT JOIN tt ON tt.query_id = ft.query_id
              |  AND tt.cand_id = ft.cand_id
              |GROUP BY 1 ORDER BY ft.query_id""".stripMargin)
    ),

    // IR evaluation harness: brute-force cosine top-10 as the run,
    // same-label vectors as binary qrels — per query recall@10 / MRR /
    // nDCG@10 in exact fixed point. The nDCG rank weights are integer
    // literals computed once on the driver (floor(1e6/log2(r+1))), so
    // no libm call reaches either engine; DuckDB replays the run, the
    // qrels, and every metric bit-for-bit.
    "q_sim_retrieval_eval" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val run = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e,
            k = 10)
          .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
        val qrels = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("query_id"), col("label").as("_ql"))
          .join(e.select(col("vec_id").as("doc_id"), col("label").as("_cl")),
            col("_ql") === col("_cl") && col("query_id") =!= col("doc_id"))
          .select("query_id", "doc_id")
        graft.ops.Retrieval.evalMetrics(run, qrels, k = 10)
          .orderBy("query_id")
      },
      Some {
        val w = graft.ops.Retrieval.ndcgWeights(10)
        val wVals = w.zipWithIndex
          .map { case (x, i) => s"(${i + 1}, $x)" }.mkString(", ")
        val pVals = w.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (x, i) => s"(${i + 1}, $x)" }.mkString(", ")
        s"""WITH scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
           |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 50),
           |run AS (
           |  SELECT query_id, doc_id,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |                            ORDER BY cos_bp DESC, doc_id)
           |      AS INTEGER) AS rank
           |  FROM scored),
           |qrels AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id
           |  FROM embeddings q JOIN embeddings c
           |    ON q.label = c.label AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 50),
           |nrel AS (SELECT query_id, count(*) AS n_rel
           |         FROM qrels GROUP BY query_id),
           |weights AS (SELECT * FROM (VALUES $wVals) AS t(rank, wt)),
           |prefixes AS (SELECT * FROM (VALUES $pVals) AS p(n, idcg)),
           |labeled AS (
           |  SELECT r.query_id, r.rank, (qr.doc_id IS NOT NULL) AS rel
           |  FROM run r LEFT JOIN qrels qr
           |    ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
           |  WHERE r.rank <= 10),
           |agg AS (
           |  SELECT l.query_id,
           |    CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_hits,
           |    min(CASE WHEN rel THEN l.rank END) AS fr,
           |    CAST(sum(CASE WHEN rel THEN w.wt ELSE 0 END) AS BIGINT)
           |      AS dcg_micro
           |  FROM labeled l JOIN weights w ON w.rank = l.rank
           |  GROUP BY l.query_id)
           |SELECT a.query_id, n.n_rel, a.n_hits,
           |  CAST(coalesce(a.fr, 0) AS INTEGER) AS first_rank,
           |  CAST((10000 * a.n_hits) // n.n_rel AS BIGINT) AS recall_bp,
           |  CAST(CASE WHEN a.fr IS NULL THEN 0 ELSE 1000000 // a.fr END
           |    AS BIGINT) AS mrr_micro,
           |  a.dcg_micro,
           |  CAST(p.idcg AS BIGINT) AS idcg_micro,
           |  CAST((10000 * a.dcg_micro) // CAST(p.idcg AS BIGINT)
           |    AS BIGINT) AS ndcg_bp
           |FROM agg a JOIN nrel n USING (query_id)
           |JOIN prefixes p ON p.n = least(n.n_rel, 10)
           |ORDER BY a.query_id""".stripMargin
      }
    ),

    // SemDeDup: k-means cells fence the pairwise work, within-cell
    // cosine pairs ≥ 0.4 form duplicate groups, each keeps its LEAST
    // centroid-similar member (diversity policy, ties to lowest id).
    // The oracle replays the full Lloyd loop (the IVF CTE chain), the
    // argmax assignment with the same tie rule, the fenced pair join,
    // a recursive transitive closure, and the argmin keep policy.
    "q_dedup_semantic" -> QueryDef(
      (s, d) =>
        Similarity.semanticDedup(Tables.embeddings(s, d),
            nCells = 16, lloydIters = IvfLloydIters, minCosBp = 4000L)
          .orderBy("cluster_id"),
      Some(s"""WITH RECURSIVE ${kmeansCentsCtes(IvfLloydIters)},
              |asg AS (
              |  SELECT vec_id, cell, CAST(floor(s * 10000) AS BIGINT) AS csim_bp
              |  FROM (
              |    SELECT vec_id, cell, s,
              |      row_number() OVER (PARTITION BY vec_id
              |                         ORDER BY s DESC, cell DESC) AS rn
              |    FROM score$IvfLloydIters) WHERE rn = 1),
              |pairs AS (
              |  SELECT x.vec_id AS i, y.vec_id AS j
              |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
              |  JOIN embeddings q ON q.vec_id = x.vec_id
              |  JOIN embeddings c ON c.vec_id = y.vec_id
              |  WHERE CAST(floor(($cosineSql) * 10000) AS BIGINT) >= 4000),
              |edges AS (SELECT i AS a, j AS b FROM pairs
              |          UNION ALL SELECT j AS a, i AS b FROM pairs),
              |reach AS (
              |  SELECT a AS doc_id, b AS r FROM edges
              |  UNION
              |  SELECT re.doc_id, e.b AS r FROM reach re JOIN edges e ON e.a = re.r),
              |labels AS (
              |  SELECT doc_id, least(doc_id, min(r)) AS cluster_id
              |  FROM reach GROUP BY doc_id)
              |SELECT l.cluster_id,
              |  first(l.doc_id ORDER BY a.csim_bp, l.doc_id) AS keep_id,
              |  first(a.csim_bp ORDER BY a.csim_bp, l.doc_id) AS keep_csim_bp,
              |  count(*) AS cluster_size
              |FROM labels l JOIN asg a ON a.vec_id = l.doc_id
              |GROUP BY l.cluster_id ORDER BY l.cluster_id""".stripMargin)
    ),

    // Rank-biased overlap between the COSINE ranking and the raw-DOT
    // ranking of the same corpus (Webber et al. 2010, truncated at
    // depth 8, p=0.9): the order-sensitive answer to "does skipping
    // normalization change what retrieval returns?" — recall@k treats
    // the two lists as sets, RBO weights top-of-list disagreement
    // geometrically. Weights are driver-computed integer literals shared
    // by both engines; the oracle replays both rankings, the match
    // depths, the depth table, and the nano-unit sum.
    "q_sim_rbo_cos_vs_dot" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 30)
        val cosRank = Similarity.bruteForceTopK(q, e, k = 8)
        val qd = q.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))
        val dotRank = e.select(col("vec_id").as("cand_id"),
            col("embedding").as("cv"))
          .join(broadcast(qd), col("query_id") =!= col("cand_id"))
          .withColumn("dot_bp",
            floor(Similarity.dot(col("qv"), col("cv")) * 10000)
              .cast("long"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("query_id")
              .orderBy(desc("dot_bp"), col("cand_id"))))
          .filter(col("rank") <= 8)
          .select("query_id", "cand_id", "rank")
        Similarity.rboAgreement(cosRank, dotRank, k = 8, pBp = 9000L)
          .orderBy("query_id")
      },
      Some({
        val wVals = Similarity.rboWeights(8, 9000L)
          .map { case (d, w) => s"($d, $w)" }.mkString(", ")
        s"""WITH mscored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp,
           |    CAST(floor((list_reduce(list_transform(
           |        generate_series(1, len(q.embedding)),
           |        x -> q.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE),
           |        (s, v) -> s + v)) * 10000) AS BIGINT) AS dot_bp
           |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 30),
           |ra AS (
           |  SELECT query_id, cand_id, rn AS rank FROM (
           |    SELECT query_id, cand_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY cos_bp DESC, cand_id)
           |      AS rn FROM mscored) WHERE rn <= 8),
           |rb AS (
           |  SELECT query_id, cand_id, rn AS rank FROM (
           |    SELECT query_id, cand_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY dot_bp DESC, cand_id)
           |      AS rn FROM mscored) WHERE rn <= 8),
           |md AS (
           |  SELECT a.query_id, greatest(a.rank, b.rank) AS md
           |  FROM ra a JOIN rb b
           |    ON a.query_id = b.query_id AND a.cand_id = b.cand_id),
           |depths AS (
           |  SELECT query_id, d FROM (SELECT DISTINCT query_id FROM ra),
           |    (SELECT unnest(generate_series(1, 8))::BIGINT AS d)),
           |ov AS (
           |  SELECT dp.query_id, dp.d,
           |    CAST(sum(CASE WHEN m.md <= dp.d THEN 1 ELSE 0 END)
           |      AS BIGINT) AS overlap_d
           |  FROM depths dp LEFT JOIN md m ON m.query_id = dp.query_id
           |  GROUP BY 1, 2),
           |w(d, wv) AS (VALUES $wVals)
           |SELECT query_id,
           |  max(CASE WHEN d = 8 THEN overlap_d END) AS overlap_k,
           |  CAST(sum((wv * overlap_d) // d) AS BIGINT) AS rbo_u
           |FROM ov JOIN w USING (d)
           |GROUP BY query_id ORDER BY query_id""".stripMargin
      })
    ),

    // k-center greedy coreset (Sener & Savarese 2018 farthest-point
    // traversal): a 6-vector diverse skeleton of the embedding corpus
    // with its certified radius sequence — round r picks the vector
    // whose max cosine to the already-picked set is LOWEST (the
    // farthest), ties to the lower id, seeded at the lowest id. The
    // cover_bp column is the k-center radius trace (non-decreasing);
    // its last row bounds every vector's distance to the coreset. The
    // oracle replays all six argmin rounds against the same floored
    // cosines.
    "q_sim_kcenter_coreset" -> QueryDef(
      (s, d) =>
        Similarity.kCenterCoreset(Tables.embeddings(s, d), k = 6)
          .orderBy("round"),
      Some(s"""WITH ${kcenterRoundsCtes(6)}
              |SELECT round, vid AS vec_id, cover_bp
              |FROM selall6 ORDER BY round""".stripMargin)
    ),

    // MMR diversity re-ranking (Carbonell & Goldstein 1998): brute-force
    // top-12 shortlists for 20 query vectors, greedily re-ranked to 4
    // results per query with λ=0.7 — each round's winner maximizes
    // λ·rel − (1−λ)·max-sim-to-already-selected in pure-integer
    // micro-units. The oracle replays the shortlist, the k²-bounded
    // pairwise sim table, and all four unrolled greedy rounds; the mmr_u
    // scores ride every row so the hash pins the arithmetic, not just
    // the picks.
    "q_sim_mmr_rerank" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cands = Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 20), e, k = 12)
        Similarity.mmrRerank(cands, e, kOut = 4, lambdaBp = 7000L)
          .orderBy("query_id", "mmr_rank")
      },
      Some(s"""WITH mscored AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20),
              |cand AS (
              |  SELECT query_id, cand_id, cos_bp FROM (
              |    SELECT *, row_number() OVER (PARTITION BY query_id
              |      ORDER BY cos_bp DESC, cand_id) AS rn
              |    FROM mscored) WHERE rn <= 12),
              |sims AS (
              |  SELECT x.query_id, x.cand_id AS i, y.cand_id AS j,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS sim_bp
              |  FROM cand x JOIN cand y
              |    ON x.query_id = y.query_id AND x.cand_id <> y.cand_id
              |  JOIN embeddings q ON q.vec_id = x.cand_id
              |  JOIN embeddings c ON c.vec_id = y.cand_id),
              |${mmrRoundsCtes(4, 7000L)}
              |SELECT query_id, mmr_rank, cand_id, cos_bp, mmr_u
              |FROM selall4 ORDER BY query_id, mmr_rank""".stripMargin)
    ),

    // Cluster-prototype difficulty pruning (Sorscher et al. 2022): after
    // the same fixed-point Lloyd the IVF/semantic-dedup queries train,
    // every embedding's difficulty is its centroid cosine in basis
    // points, and each cell keeps only its hardest 25% (ceil — a
    // non-empty cell never empties, so no data mode is erased). The
    // per-cell rank uses the curriculum value-domain decomposition, so
    // no corpus-sized window exists in the plan. The oracle replays
    // Lloyd, the argmax assignment, and the rank; `cell` surfaces in the
    // output, so the oracle densifies its seed-id cells to the 0-based
    // vec_id-order index the Spark side uses (a monotone remap — argmax
    // ties are unaffected).
    "q_sim_prototype_prune" -> QueryDef(
      (s, d) =>
        Similarity.prototypePrune(Tables.embeddings(s, d),
            nCells = 16, lloydIters = IvfLloydIters, keepHardBp = 2500L)
          .orderBy("vec_id"),
      Some(s"""WITH RECURSIVE ${kmeansCentsCtes(IvfLloydIters)},
              |cellmap AS (
              |  SELECT cell, row_number() OVER (ORDER BY cell) - 1 AS cell_ix
              |  FROM cents0),
              |asg AS (
              |  SELECT q.vec_id, m.cell_ix AS cell,
              |    CAST(floor(q.s
              |      / sqrt(list_reduce(list_transform(
              |          generate_series(1, len(e.embedding)),
              |          x -> e.embedding[x]::DOUBLE * e.embedding[x]::DOUBLE),
              |          (s, v) -> s + v))
              |      * 10000) AS BIGINT) AS csim_bp
              |  FROM (
              |    SELECT vec_id, cell, s,
              |      row_number() OVER (PARTITION BY vec_id
              |                         ORDER BY s DESC, cell DESC) AS rn
              |    FROM score$IvfLloydIters) q
              |  JOIN cellmap m USING (cell)
              |  JOIN embeddings e ON e.vec_id = q.vec_id
              |  WHERE rn = 1),
              |ranked AS (
              |  SELECT vec_id, cell, csim_bp,
              |    row_number() OVER (PARTITION BY cell
              |                       ORDER BY csim_bp ASC, vec_id ASC)
              |      AS cell_rank,
              |    count(*) OVER (PARTITION BY cell) AS cell_n
              |  FROM asg)
              |SELECT vec_id, cell, csim_bp, cell_rank, cell_n
              |FROM ranked
              |WHERE cell_rank <= (cell_n * 2500 + 9999) // 10000
              |ORDER BY vec_id""".stripMargin)
    ),

    // Margin-based bitext mining between the even-label and odd-label
    // halves of the corpus (stand-ins for two monolingual sides): top-2
    // matches per source vector, margin-normalized by both 4-NN
    // neighborhoods, mined pairs = margin ≥ 1.0. The oracle replays both
    // k-NN sweeps, the neighborhood sums, and the margin division.
    "q_sim_bitext_mine" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bitextMine(
            e.filter(pmod(col("label"), lit(2)) === 0),
            e.filter(pmod(col("label"), lit(2)) === 1),
            k = 4, topn = 2, minMarginBp = 10000L)
          .orderBy("src_id", "tgt_id")
      },
      Some(s"""WITH a AS (SELECT * FROM embeddings WHERE label % 2 = 0),
              |b AS (SELECT * FROM embeddings WHERE label % 2 = 1),
              |ab AS (
              |  SELECT query_id, cand_id, cos_bp,
              |    row_number() OVER (PARTITION BY query_id
              |                       ORDER BY cos_bp DESC, cand_id) AS rnk
              |  FROM (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |      CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |    FROM a q CROSS JOIN b c)),
              |ba AS (
              |  SELECT query_id, cand_id, cos_bp,
              |    row_number() OVER (PARTITION BY query_id
              |                       ORDER BY cos_bp DESC, cand_id) AS rnk
              |  FROM (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |      CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |    FROM b q CROSS JOIN a c)),
              |ax AS (SELECT query_id AS src_id, sum(cos_bp) AS ax
              |  FROM ab WHERE rnk <= 4 GROUP BY 1),
              |ay AS (SELECT query_id AS tgt_id, sum(cos_bp) AS ay
              |  FROM ba WHERE rnk <= 4 GROUP BY 1),
              |cand AS (SELECT query_id AS src_id, cand_id AS tgt_id, cos_bp
              |  FROM ab WHERE rnk <= 2),
              |m AS (
              |  SELECT src_id, tgt_id, cos_bp,
              |    CAST(floor(80000 * cos_bp / (ax + ay)) AS BIGINT) AS margin_bp
              |  FROM cand JOIN ax USING (src_id) JOIN ay USING (tgt_id)
              |  WHERE ax + ay > 0)
              |SELECT src_id, tgt_id, cos_bp, margin_bp FROM m
              |WHERE margin_bp >= 10000 ORDER BY src_id, tgt_id""".stripMargin)
    ),

    // Hard-negative mining: per anchor, the 3 most-similar vectors with a
    // different label — the contrastive-training pairs a metric model
    // needs. Broadcast anchors × streamed corpus, label-mismatch join.
    "q_sim_hard_negatives" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.hardNegatives(e.filter(col("vec_id") < 20), e, k = 3)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH scored AS (
              |  SELECT q.vec_id AS query_id, q.label AS q_label,
              |    c.vec_id AS cand_id, c.label AS c_label,
              |    CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |  FROM embeddings q JOIN embeddings c ON q.label <> c.label
              |  WHERE q.vec_id < 20),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |                              ORDER BY cos_bp DESC, cand_id)
              |    AS rank_raw
              |  FROM scored)
              |SELECT query_id, q_label, cand_id, c_label, cos_bp,
              |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
              |WHERE rank_raw <= 3 ORDER BY query_id, rank""".stripMargin)
    ),

    // Range search: all vectors within cosine ≥ 0.35 of query vec_id=0.
    "q_sim_range_search" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        e.filter(col("vec_id") =!= 0)
          .join(broadcast(q))
          .withColumn("cos_bp",
            floor(Similarity.cosine(col("qv"), col("embedding")) * 10000).cast("long"))
          .filter(col("cos_bp") >= 3500)
          .select(col("vec_id").as("cand_id"), col("cos_bp"))
          .orderBy("cand_id")
      },
      Some(s"""SELECT c.vec_id AS cand_id,
              |  CAST(floor(($cosineSql) * 10000) AS BIGINT) AS cos_bp
              |FROM embeddings c JOIN embeddings q ON q.vec_id = 0
              |WHERE c.vec_id <> 0 AND cos_bp >= 3500
              |ORDER BY cand_id""".stripMargin)
    ),

    // Scale path: multi-table LSH ANN, fully value-checked — the ±1
    // hyperplanes derive from md5("t:p:h") bit parity, so DuckDB rebuilds
    // the same 6 tables × 6 planes, buckets, candidates, and exact-cosine
    // ranks (left-to-right double accumulation throughout).
    "q_sim_lsh_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.lshTopK(e.filter(col("vec_id") < 50), e, k = 5, dim = 64,
            nPlanes = 6, nTables = 6)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH grid AS (
             |  SELECT t.t, p.p FROM
             |    (SELECT unnest(generate_series(0, 5)) AS t) t,
             |    (SELECT unnest(generate_series(0, 5)) AS p) p),
             |proj AS (
             |  SELECT e.vec_id, g.t, g.p,
             |    list_reduce(list_transform(generate_series(1, 64),
             |      h -> e.embedding[h]::DOUBLE *
             |        (CASE WHEN (instr('0123456789abcdef',
             |            substring(md5(g.t::VARCHAR || ':' || g.p::VARCHAR || ':'
             |                          || (h - 1)::VARCHAR), 2, 1)) - 1) % 2 = 1
             |          THEN 1.0 ELSE -1.0 END)),
             |      (s, v) -> s + v) AS s
             |  FROM embeddings e, grid g),
             |buckets AS (
             |  SELECT vec_id, t,
             |    string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY p)
             |      AS b
             |  FROM proj GROUP BY vec_id, t),
             |cand AS (
             |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
             |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.b = c.b
             |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
             |norms AS (
             |  SELECT vec_id, sqrt(list_reduce(list_transform(
             |      generate_series(1, len(embedding)),
             |      x -> embedding[x]::DOUBLE * embedding[x]::DOUBLE), (s, v) -> s + v))
             |    AS nrm
             |  FROM embeddings),
             |scored AS (
             |  SELECT cand.query_id, cand.cand_id,
             |    CAST(floor(
             |      list_reduce(list_transform(generate_series(1, len(q.embedding)),
             |          x -> q.embedding[x]::DOUBLE * t2.embedding[x]::DOUBLE),
             |        (s, v) -> s + v)
             |      / (nq.nrm * nt.nrm) * 10000) AS BIGINT) AS cos_bp
             |  FROM cand
             |  JOIN embeddings q ON q.vec_id = cand.query_id
             |  JOIN embeddings t2 ON t2.vec_id = cand.cand_id
             |  JOIN norms nq ON nq.vec_id = cand.query_id
             |  JOIN norms nt ON nt.vec_id = cand.cand_id),
             |ranked AS (
             |  SELECT query_id, cand_id, cos_bp,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos_bp DESC, cand_id)
              |      AS rank_raw
             |  FROM scored)
             |SELECT query_id, cand_id, cos_bp,
             |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
             |WHERE rank_raw <= 5 ORDER BY query_id, rank""".stripMargin)
    ),

    // Random-projection ANN: JL sign-projection 64→16 dims (the same
    // md5-parity family as the LSH hyperplanes, table id 99), rank ALL
    // pairs in the cheap reduced space, keep 4·k candidates per query,
    // rerank those by exact cosine. No bucket-boundary recall cliff —
    // the candidate count per query is fixed by construction. DuckDB
    // replays projection, prefilter and rerank bit-for-bit.
    "q_sim_rp_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.rpTopK(e.filter(col("vec_id") < 50), e, k = 5, dim = 64,
            rDim = 16, overfetch = 4)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH rproj AS (
              |  SELECT e.vec_id, d.d,
              |    list_reduce(list_transform(generate_series(1, 64),
              |      h -> e.embedding[h]::DOUBLE *
              |        (CASE WHEN (instr('0123456789abcdef',
              |            substring(md5('99:' || d.d::VARCHAR || ':'
              |                          || (h - 1)::VARCHAR), 2, 1)) - 1) % 2 = 1
              |          THEN 1.0 ELSE -1.0 END)),
              |      (s, v) -> s + v) AS r
              |  FROM embeddings e, (SELECT unnest(generate_series(0, 15)) AS d) d),
              |rvecs AS (
              |  SELECT vec_id, list(r ORDER BY d) AS rv FROM rproj GROUP BY vec_id),
              |rscore AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST(floor(
              |      list_reduce(list_transform(generate_series(1, 16),
              |          i -> q.rv[i] * c.rv[i]), (s, v) -> s + v)
              |      / (sqrt(list_reduce(list_transform(generate_series(1, 16),
              |            i -> q.rv[i] * q.rv[i]), (s, v) -> s + v))
              |       * sqrt(list_reduce(list_transform(generate_series(1, 16),
              |            i -> c.rv[i] * c.rv[i]), (s, v) -> s + v)))
              |      * 10000) AS BIGINT) AS rcos_bp
              |  FROM rvecs q JOIN rvecs c
              |    ON q.vec_id < 50 AND c.vec_id <> q.vec_id),
              |kept AS (
              |  SELECT query_id, cand_id FROM (
              |    SELECT query_id, cand_id,
              |      row_number() OVER (PARTITION BY query_id
              |                         ORDER BY rcos_bp DESC, cand_id) AS prn
              |    FROM rscore) WHERE prn <= 20),
              |norms AS (
              |  SELECT vec_id, sqrt(list_reduce(list_transform(
              |      generate_series(1, len(embedding)),
              |      x -> embedding[x]::DOUBLE * embedding[x]::DOUBLE), (s, v) -> s + v))
              |    AS nrm
              |  FROM embeddings),
              |scored AS (
              |  SELECT k.query_id, k.cand_id,
              |    CAST(floor(
              |      list_reduce(list_transform(generate_series(1, len(q.embedding)),
              |          x -> q.embedding[x]::DOUBLE * t2.embedding[x]::DOUBLE),
              |        (s, v) -> s + v)
              |      / (nq.nrm * nt.nrm) * 10000) AS BIGINT) AS cos_bp
              |  FROM kept k
              |  JOIN embeddings q ON q.vec_id = k.query_id
              |  JOIN embeddings t2 ON t2.vec_id = k.cand_id
              |  JOIN norms nq ON nq.vec_id = k.query_id
              |  JOIN norms nt ON nt.vec_id = k.cand_id),
              |ranked AS (
              |  SELECT query_id, cand_id, cos_bp,
              |    row_number() OVER (PARTITION BY query_id
              |                       ORDER BY cos_bp DESC, cand_id) AS rank_raw
              |  FROM scored)
              |SELECT query_id, cand_id, cos_bp,
              |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
              |WHERE rank_raw <= 5 ORDER BY query_id, rank""".stripMargin)
    ),

    // IVF ANN: coarse-quantizer cells + nProbe search, fully value-checked.
    // The index is now a real (if deterministic) k-means: first-16 seed +
    // 3 Lloyd rounds, each centroid mean computed as an ORDERED
    // left-to-right fold over members sorted by vec_id — so DuckDB replays
    // the ENTIRE training loop bit-for-bit (list_reduce over
    // list(ORDER BY)), then the same assignment (argmax dot/|c|, ties to
    // higher cell), probe ranking, candidate join, exact-cosine top-k.
    "q_sim_ivf_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopK(e.filter(col("vec_id") < 50), e, k = 5,
            nCells = 16, nProbe = 4, lloydIters = IvfLloydIters)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${kmeansCentsCtes(IvfLloydIters)},
             |assigned AS (
             |  SELECT vec_id, cell FROM (
             |    SELECT vec_id, cell,
             |      row_number() OVER (PARTITION BY vec_id
             |                         ORDER BY s DESC, cell DESC) AS rn
             |    FROM score$IvfLloydIters) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS query_id, cell FROM (
             |    SELECT vec_id, cell,
             |      row_number() OVER (PARTITION BY vec_id
             |                         ORDER BY s DESC, cell DESC) AS rn
             |    FROM score$IvfLloydIters WHERE vec_id < 50) WHERE rn <= 4),
             |norms AS (
             |  SELECT vec_id, sqrt(list_reduce(list_transform(
             |      generate_series(1, len(embedding)),
             |      x -> embedding[x]::DOUBLE * embedding[x]::DOUBLE), (s, v) -> s + v))
             |    AS nrm
             |  FROM embeddings),
             |scored AS (
             |  SELECT p.query_id, a.vec_id AS cand_id,
             |    CAST(floor(
             |      list_reduce(list_transform(generate_series(1, len(q.embedding)),
             |          x -> q.embedding[x]::DOUBLE * t.embedding[x]::DOUBLE),
             |        (s, v) -> s + v)
             |      / (nq.nrm * nt.nrm) * 10000) AS BIGINT) AS cos_bp
             |  FROM probes p
             |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
             |  JOIN embeddings q ON q.vec_id = p.query_id
             |  JOIN embeddings t ON t.vec_id = a.vec_id
             |  JOIN norms nq ON nq.vec_id = p.query_id
             |  JOIN norms nt ON nt.vec_id = a.vec_id),
             |ranked AS (
             |  SELECT query_id, cand_id, cos_bp,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos_bp DESC, cand_id)
              |      AS rank_raw
             |  FROM scored)
             |SELECT query_id, cand_id, cos_bp,
             |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
             |WHERE rank_raw <= 5 ORDER BY query_id, rank""".stripMargin)
    ),

    // Centroid stats per label — the IVF building block (coarse quantizer
    // assignment = argmin distance to centroid), oracle-checked.
    "q_sim_label_centroids" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // mean of component 0 and norm stats per label
        e.groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            floor(avg(element_at(col("embedding"), 1).cast("double")) * 10000)
              .cast("long").as("c0_bp"),
            floor(avg(Similarity.norm(col("embedding"))) * 10000)
              .cast("long").as("avg_norm_bp")
          )
          .orderBy("label")
      },
      Some("""SELECT label, count(*) AS n,
             |  CAST(floor(avg(embedding[1]::DOUBLE) * 10000) AS BIGINT) AS c0_bp,
             |  CAST(floor(avg(sqrt(list_reduce(
             |    list_transform(generate_series(1, len(embedding)),
             |      x -> embedding[x]::DOUBLE * embedding[x]::DOUBLE),
             |    (s, v) -> s + v))) * 10000) AS BIGINT) AS avg_norm_bp
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
    ),

    // Top principal component by power iteration: fixed-point means +
    // n-divided integer covariance (one narrow outer-product
    // projection, 4096-row driver table), 6 replayable x ← Cx/‖Cx‖
    // rounds, per-vector projection as a zero-shuffle array fold. The
    // oracle replays means, covariance, all 6 iterations, and every
    // projection bit-for-bit.
    "q_sim_pca_projection" -> QueryDef(
      (s, d) =>
        Similarity.pcaTopProjection(Tables.embeddings(s, d), iters = 6)
          .join(Tables.embeddings(s, d).select("vec_id", "label"), "vec_id")
          .select(col("vec_id"), col("label"), col("proj_micro"))
          .orderBy("vec_id"),
      Some(s"""WITH ${pcaCtes(6)}
             |SELECT p.vec_id, e.label, p.proj_micro
             |FROM proj p JOIN embeddings e USING (vec_id)
             |ORDER BY vec_id""".stripMargin)
    ),

    // Product-quantization ANN (Jégou et al. 2011): 4 subspaces × 8
    // spherical-k-means codewords each (1 Lloyd round), candidates
    // encoded to 4 code ids, queries answered by asymmetric distance —
    // the per-query m×k lookup table of exact subspace dots, candidate
    // score = order-free BIGINT sum of the 4 selected micro-unit
    // entries — then the top 50 ADC shortlist reranked by exact cosine
    // (the IVFADC+rerank contract). The oracle replays all four
    // subspace trainings, the encoding, the LUT, the ADC shortlist, and
    // the exact rerank bit-for-bit.
    "q_sim_pq_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.pqTopK(e.filter(col("vec_id") < 5), e, k = 10,
            m = 4, kCodes = 8, lloydIters = 1, overfetch = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${(0 until 4).map(s =>
                 pqSubCtes(s, s * 16 + 1, 16, 8, 1, "vec_id < 5"))
                 .mkString(",\n")},
             |enc AS (${(0 until 4).map(s => s"SELECT * FROM s${s}_enc")
                 .mkString(" UNION ALL ")}),
             |lut AS (${(0 until 4).map(s => s"SELECT * FROM s${s}_lut")
                 .mkString(" UNION ALL ")}),
             |adc AS (
             |  SELECT l.query_id, e.vec_id AS cand_id,
             |    CAST(sum(l.lut) AS BIGINT) AS adc_bp
             |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
             |  WHERE l.query_id <> e.vec_id
             |  GROUP BY 1, 2),
             |shortlist AS (
             |  SELECT query_id, cand_id, adc_bp FROM (
             |    SELECT query_id, cand_id, adc_bp,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY adc_bp DESC, cand_id) AS prn
             |    FROM adc) WHERE prn <= 50),
             |norms AS (
             |  SELECT vec_id, sqrt(list_reduce(list_transform(
             |      generate_series(1, len(embedding)),
             |      x -> embedding[x]::DOUBLE * embedding[x]::DOUBLE),
             |      (s, v) -> s + v)) AS nrm
             |  FROM embeddings),
             |rer AS (
             |  SELECT sl.query_id, sl.cand_id, sl.adc_bp,
             |    CAST(floor(
             |      list_reduce(list_transform(generate_series(1, len(q.embedding)),
             |          x -> q.embedding[x]::DOUBLE * t.embedding[x]::DOUBLE),
             |        (s, v) -> s + v)
             |      / (nq.nrm * nt.nrm) * 10000) AS BIGINT) AS cos_bp
             |  FROM shortlist sl
             |  JOIN embeddings q ON q.vec_id = sl.query_id
             |  JOIN embeddings t ON t.vec_id = sl.cand_id
             |  JOIN norms nq ON nq.vec_id = sl.query_id
             |  JOIN norms nt ON nt.vec_id = sl.cand_id),
             |ranked AS (
             |  SELECT query_id, cand_id, adc_bp, cos_bp,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos_bp DESC, cand_id)
             |      AS rank_raw
             |  FROM rer)
             |SELECT query_id, cand_id, adc_bp, cos_bp,
             |  CAST(rank_raw AS INTEGER) AS rank FROM ranked
             |WHERE rank_raw <= 10 ORDER BY query_id, rank""".stripMargin)
    ),

    // BERTopic-style cluster labeling (Grootendorst 2022 c-TF-IDF): docs
    // assigned to the oracled 16-cell k-means (same Lloyd replay as the
    // IVF family), then per cell the top-5 distinctive tokens by
    // tf_norm × (log2 17 − log2(1+cell_df)) in the shared fixed-point
    // log2 — the "what is this cluster about" readout every corpus map
    // needs. All tables vocabulary- or cell-sized after the one token
    // pass; the rank window partitions by cell.
    "q_sim_cluster_labels" -> QueryDef(
      (s, d) => {
        import graft.ops.TextAnalysis
        val w = org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, d)
        val cents = Similarity.kmeansCentroids(e, nCells = 16,
          iters = IvfLloydIters)
        val assigned = e.select(col("vec_id").as("doc_id"),
          Similarity.ivfCell(col("embedding"), cents).as("cell"))
        val tf = Tables.documents(s, d).join(assigned, "doc_id")
          .select(col("cell"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("cell", "tok").agg(count(lit(1)).as("tf"))
        val totals = tf.groupBy("cell").agg(sum("tf").as("_tot"))
        val cdf = tf.groupBy("tok").agg(countDistinct("cell").as("cdf"))
        val l17 = TextAnalysis.pseudoLog2Long(17L)
        val scored = tf.join(broadcast(totals), "cell")
          .join(TextAnalysis.withPseudoLog2(
            cdf.withColumn("_x", col("cdf") + 1), "_x", "_lcdf")
            .drop("_x"), "tok")
          .withColumn("tf_norm_micro", expr("tf * 1000000 div _tot"))
          .withColumn("score_fp", expr(s"tf_norm_micro * ($l17 - _lcdf)"))
        scored
          .withColumn("rank", row_number().over(
            w.partitionBy("cell").orderBy(desc("score_fp"), col("tok")))
            .cast("long"))
          .filter(col("rank") <= 5)
          .select(col("cell").cast("long").as("cell"), col("rank"),
            col("tok"), col("tf"), col("cdf"), col("score_fp"))
          .orderBy("cell", "rank")
      },
      Some(s"""WITH RECURSIVE ${kmeansCentsCtes(IvfLloydIters)},
             |asg AS (
             |  SELECT vec_id, cell FROM (
             |    SELECT vec_id, cell,
             |      row_number() OVER (PARTITION BY vec_id
             |                         ORDER BY s DESC, cell DESC) AS rn
             |    FROM score$IvfLloydIters) WHERE rn = 1),
             |tf AS MATERIALIZED (
             |  SELECT a.cell, t.tok, count(*)::BIGINT AS tf
             |  FROM asg a JOIN (
             |    SELECT doc_id,
             |      unnest(list_filter(string_split(text, ' '),
             |        x -> x <> '')) AS tok
             |    FROM documents) t ON t.doc_id = a.vec_id
             |  GROUP BY 1, 2),
             |tot AS (SELECT cell, CAST(sum(tf) AS BIGINT) AS tot
             |        FROM tf GROUP BY 1),
             |cdf AS (SELECT tok, count(DISTINCT cell)::BIGINT AS cdf
             |        FROM tf GROUP BY 1),
             |vals AS (SELECT DISTINCT cdf + 1 AS x FROM cdf),
             |${TextQueries.pseudoLog2Sql("c", "vals")},
             |sc AS (
             |  SELECT tf.cell, tf.tok, tf.tf, cdf.cdf,
             |    (tf.tf * 1000000 // tot.tot) *
             |      (${graft.ops.TextAnalysis.pseudoLog2Long(17L)} - lgc.l)
             |      AS score_fp
             |  FROM tf JOIN tot USING (cell) JOIN cdf USING (tok)
             |  JOIN lgc ON lgc.x = cdf.cdf + 1)
             |SELECT CAST(cell AS BIGINT) AS cell,
             |  CAST(rn AS BIGINT) AS rank, tok, tf, cdf, score_fp
             |FROM (SELECT *, row_number() OVER (PARTITION BY cell
             |        ORDER BY score_fp DESC, tok) AS rn FROM sc)
             |WHERE rn <= 5 ORDER BY cell, rank""".stripMargin)
    ),

    // Class-conditional embedding anisotropy: how much of each label's
    // energy sits in its mean direction — micro-quantized components,
    // order-free BIGINT sums, divide-early per-dim means; both engines
    // replay every quantity exactly.
    "q_sim_anisotropy" -> QueryDef(
      (s, d) => graft.ops.Similarity.anisotropy(
        Tables.embeddings(s, d), groupCols = Seq("label"))
        .orderBy("label"),
      Some("""WITH q AS (
             |  SELECT label, list_transform(embedding,
             |    x -> CAST(floor(x::DOUBLE * 1000000) AS BIGINT)) AS q
             |  FROM embeddings),
             |base AS MATERIALIZED (
             |  SELECT label, q,
             |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
             |      AS nsq
             |  FROM q),
             |stats AS (
             |  SELECT label, count(*)::BIGINT AS n_vecs,
             |    CAST(sum(nsq) AS BIGINT) AS snsq
             |  FROM base GROUP BY 1),
             |dims AS (
             |  SELECT label, i - 1 AS d, CAST(sum(q[i]) AS BIGINT) AS s
             |  FROM base, unnest(generate_series(1, len(q))) g(i)
             |  GROUP BY 1, 2),
             |agg AS (
             |  SELECT label, CAST(max(d) + 1 AS BIGINT) AS dim,
             |    CAST(sum((s // n_vecs) * (s // n_vecs)) AS BIGINT)
             |      AS mean_dir_sq_micro2,
             |    any_value(snsq // n_vecs) AS avg_sq_norm_micro2,
             |    any_value(n_vecs) AS n_vecs
             |  FROM dims JOIN stats USING (label) GROUP BY 1)
             |SELECT label, n_vecs, dim, mean_dir_sq_micro2,
             |  CAST(avg_sq_norm_micro2 AS BIGINT) AS avg_sq_norm_micro2,
             |  CASE WHEN avg_sq_norm_micro2 > 0
             |    THEN mean_dir_sq_micro2 * 10000 // avg_sq_norm_micro2
             |  END AS aniso_bp
             |FROM agg ORDER BY label""".stripMargin)
    )
  )
}
