package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.util.Tables

/** Similarity search over `embeddings` (array<float>, 64-dim).
  * Brute-force top-k is oracle-checked exactly (identical double
  * arithmetic both engines, floor-bp scores); the LSH path is the scale
  * variant — candidates only within a bucket — and is rows-only since the
  * hyperplane constants live in Scala.
  */
object SimilarityQueries extends QueryGroup {

  private val cosineSql: String =
    """list_reduce(list_transform(generate_series(1, len(q.embedding)),
      |      x -> q.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)
      |  / (sqrt(list_reduce(list_transform(generate_series(1, len(q.embedding)),
      |        x -> q.embedding[x]::DOUBLE * q.embedding[x]::DOUBLE), (s, v) -> s + v))
      |   * sqrt(list_reduce(list_transform(generate_series(1, len(c.embedding)),
      |        x -> c.embedding[x]::DOUBLE * c.embedding[x]::DOUBLE), (s, v) -> s + v)))""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Exact k-NN: top-5 cosine neighbors for the first 10 vectors.
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
              |                       ORDER BY cos_bp DESC, cand_id) AS rank
              |  FROM scored)
              |SELECT query_id, cand_id, cos_bp, rank FROM ranked
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
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

    // Scale path: LSH-bucketed ANN (rows-only — hyperplanes live in Scala;
    // recall vs brute force is asserted in SimilaritySpec).
    "q_sim_lsh_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.lshTopK(e.filter(col("vec_id") < 50), e, k = 5, dim = 64,
            nPlanes = 6, nTables = 6)
          .orderBy(col("query_id"), col("rank"))
      },
      None
    ),

    // IVF ANN: coarse-quantizer cells + nProbe search (rows-only: centroid
    // literals live in Scala; recall vs brute force pinned in spec).
    "q_sim_ivf_topk" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopK(e.filter(col("vec_id") < 50), e, k = 5,
            nCells = 16, nProbe = 4)
          .orderBy("query_id", "rank")
      },
      None
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
    )
  )
}
