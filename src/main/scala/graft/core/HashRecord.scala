package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's record type (reference src/storage/mod.rs:10-16) with a
  * typed Dataset reader for when compile-time safety beats DataFrame
  * dynamism. The canonical StructType lives in BuildJob.schema.
  */
final case class HashRecord(
    hash: Array[Byte],
    preimage: String,
    algorithm: String,
    sources: Seq[String]
) {
  def hashHex: String = Hashers.hex(hash)
}

object HashRecord {
  /** Typed view over a hash database directory. */
  def read(spark: SparkSession, db: String): Dataset[HashRecord] = {
    import spark.implicits._
    spark.read.schema(graft.pipeline.BuildJob.schema).parquet(db).as[HashRecord]
  }
}
