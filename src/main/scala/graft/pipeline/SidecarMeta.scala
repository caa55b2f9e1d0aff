package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Sidecar catalog for a hash database directory — the Spark-side stand-in
  * for the reference's Parquet footer KV metadata (reference
  * src/storage/parquet.rs:20-26, 426-474). Spark's public Parquet writer
  * can't append custom footer KVs, and at 100 TB a dataset is many files, so
  * a per-dataset `_graft_meta.json` (analogous to `_SUCCESS`) is the
  * scalable equivalent. The bloom bitmap the reference serializes here is
  * replaced by native per-file Parquet column bloom filters (BuildJob).
  *
  * Written/read through the Hadoop FileSystem API so the same code works on
  * local paths and s3a:// URIs.
  */
final case class SidecarMeta(
    totalRecords: Long,
    algorithms: Seq[String],
    sources: Seq[String],
    sourceHashes: Seq[String] // blake3 content fingerprints for incremental builds
) {
  def toJson: String = {
    def arr(xs: Seq[String]) =
      xs.map(s => "\"" + SidecarMeta.escape(s) + "\"").mkString("[", ",", "]")
    s"""{"total_records":$totalRecords,"algorithms":${arr(algorithms)},""" +
      s""""sources":${arr(sources)},"source_hashes":${arr(sourceHashes)}}"""
  }
}

object SidecarMeta {
  val FileName = "_graft_meta.json"

  private[pipeline] def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def write(spark: SparkSession, dir: String, meta: SidecarMeta): Unit = {
    val path = new Path(dir, FileName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(meta.toJson.getBytes(UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Option[SidecarMeta] = {
    val path = new Path(dir, FileName)
    // any read failure (missing, checksum mismatch, truncated write) means
    // "no catalog" — callers fall back to the aggregate scan, never fail
    try {
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        val json =
          try new String(in.readAllBytes(), UTF_8)
          finally in.close()
        parse(json)
      }
    } catch {
      case _: java.io.IOException => None
    }
  }

  /** Tiny parser for the fixed shape we write (no JSON lib on the offline
    * classpath worth pulling in for four fields).
    */
  private[pipeline] def parse(json: String): Option[SidecarMeta] = {
    def longField(name: String): Option[Long] =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    def arrField(name: String): Seq[String] =
      s""""$name"\\s*:\\s*\\[(.*?)\\]""".r
        .findFirstMatchIn(json)
        .map(_.group(1))
        .filter(_.nonEmpty)
        .map(body => "\"(.*?)(?<!\\\\)\"".r.findAllMatchIn(body).map { m =>
          m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        }.toSeq)
        .getOrElse(Seq.empty)
    longField("total_records").map { n =>
      SidecarMeta(n, arrField("algorithms"), arrField("sources"), arrField("source_hashes"))
    }
  }
}
