package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Compatibility reader for the reference engine's Parquet footer
  * key/value catalog (`shaha:*` keys — reference src/storage/parquet.rs:20-26,
  * written at parquet.rs:426-474, read back at parquet.rs:152-202). A
  * database produced by the reference carries its record count, algorithm
  * and source lists inside each file's footer; without this reader a stats
  * call on such a file would fall back to a full scan.
  *
  * Multi-file datasets merge per-file entries: counts summed, name sets
  * unioned (the reference writes a single file; Spark output is many).
  * The serialized sip-keyed bloom (`shaha:bloom_*`, parquet.rs:444-461) is
  * deliberately NOT consumed — pruning on this side uses native parquet
  * column bloom filters and hash range predicates, which the scan applies
  * automatically.
  *
  * Footer reads happen driver-side, one small ranged read per file — fine
  * for a stats call even on large datasets; the data pages are never
  * touched.
  */
object FooterMeta {
  private val KeyTotal = "shaha:total_records"
  private val KeyAlgorithms = "shaha:algorithms"
  private val KeySources = "shaha:sources"
  private val KeySourceHashes = "shaha:source_hashes"

  /** Stats from `shaha:*` footer metadata of a parquet file or a directory
    * of parquet files; None when absent/unreadable (callers fall back).
    */
  def read(spark: SparkSession, db: String): Option[SidecarMeta] = try {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(db)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val files =
      if (!fs.getFileStatus(root).isDirectory) Seq(root)
      else fs.listStatus(root).toSeq.map(_.getPath).filter { p =>
        val n = p.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
    val metas = files.flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala
        // total_records is the marker key, like the reference's read path
        // (parquet.rs:195-202 requires total+algorithms+sources; we accept
        // a lone total with empty lists rather than discarding it)
        kv.get(KeyTotal).flatMap(t => t.toLongOption).map { total =>
          def csv(key: String): Seq[String] =
            kv.get(key).toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
          SidecarMeta(total, csv(KeyAlgorithms), csv(KeySources),
            kv.get(KeySourceHashes).toSeq.flatMap(parseJsonArray))
        }
      } finally reader.close()
    }
    if (metas.isEmpty) None
    else Some(SidecarMeta(
      metas.map(_.totalRecords).sum,
      metas.flatMap(_.algorithms).distinct.sorted,
      metas.flatMap(_.sources).distinct.sorted,
      metas.flatMap(_.sourceHashes).distinct.sorted))
  } catch { case _: Exception => None }

  /** The reference serializes source_hashes as a JSON string array
    * (parquet.rs:464-471); same minimal parser as the sidecar's.
    */
  private[pipeline] def parseJsonArray(s: String): Seq[String] =
    "\"(.*?)(?<!\\\\)\"".r.findAllMatchIn(s)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toSeq
}
