package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.util.Tables

/** Multimodal binary-column plumbing exercised end-to-end. The header
  * metadata query is fully oracled: the GRFT container's dimensions are a
  * deterministic function of doc_id and the payload is the document's
  * UTF-8 bytes, so DuckDB recomputes the expected metadata independently
  * from `documents` — which value-checks the whole synthesize → binary
  * header → describe() round trip, not just our own readback. The feature
  * query stays rows-only (its checksum is blake3, which DuckDB lacks;
  * MultimodalSpec pins those semantics).
  */
object MultimodalQueries extends QueryGroup {

  val defs: Map[String, QueryDef] = Map(

    // Synthesize media payloads, decode headers, aggregate per modality.
    "q_multimodal_meta" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(Tables.documents(s, d))
        media
          .select(col("modality"), Multimodal.describe(col("media")).as("m"))
          .groupBy("modality")
          .agg(
            count(lit(1)).as("n"),
            sum(col("m.payload_bytes")).as("total_payload"),
            max(col("m.width")).as("max_width"),
            sum(col("m.n_frames")).as("total_frames"))
          .orderBy("modality")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    (doc_id % 3 + 1) AS code,
             |    16 + (doc_id % 64) AS width,
             |    CASE WHEN doc_id % 3 + 1 = 3 THEN 4 + (doc_id % 8) ELSE 1 END
             |      AS n_frames,
             |    octet_length(encode(text)) AS payload_bytes
             |  FROM documents)
             |SELECT CASE code WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
             |    ELSE 'video' END AS modality,
             |  count(*) AS n,
             |  CAST(sum(payload_bytes) AS BIGINT) AS total_payload,
             |  CAST(max(width) AS INTEGER) AS max_width,
             |  CAST(sum(n_frames) AS BIGINT) AS total_frames
             |FROM m GROUP BY 1 ORDER BY modality""".stripMargin)
    ),

    // Frame sampling + stubbed feature extraction over sampled media.
    "q_multimodal_features" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(Tables.documents(s, d).limit(200))
        Multimodal.extractFeatures(media)()
          .toDF()
          .select(col("media_id"), col("modality"), col("checksum"),
            element_at(col("feature"), 1).as("f0"))
          .orderBy("media_id")
      },
      None
    )
  )
}
