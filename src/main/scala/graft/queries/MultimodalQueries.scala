package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.util.Tables

/** Multimodal binary-column plumbing exercised end-to-end (rows-only: the
  * GRFT container synthesis/decoding lives in Scala; MultimodalSpec pins
  * the round-trip semantics).
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
      None
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
