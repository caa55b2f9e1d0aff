package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for built hash databases.
  *
  * Long append histories leave a database as many small parquet files
  * (every `BuildJob.run(append = true)` writes at least one); at object-
  * store scale that means per-file open/footer overhead on every query
  * and a metadata crawl per stats call. Compaction rewrites the dataset
  * into ⌈total bytes / targetBytes⌉ files while PRESERVING the layout
  * contract: a global range-partitioned sort by `hash`, so per-file
  * min/max ranges and bloom filters keep serving prefix/exact pruning
  * exactly as BuildJob wrote them, and the sidecar + `shaha:*` footers
  * are re-stamped so both catalogs stay correct.
  *
  * Same staging discipline as append builds: write to `<db>_compacting`,
  * then swap via FileSystem rename — readers never observe a half-written
  * database, and the path works on any Hadoop FileSystem (ObjectStoreSpec
  * exercises it on a non-`file` scheme).
  */
object Compact {

  final case class Result(filesBefore: Int, filesAfter: Int, records: Long)

  /** Parquet data files directly under `db` (same filter as FooterMeta). */
  private def dataFiles(spark: SparkSession, db: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(db)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith("."))
        buf += s
    }
    buf.result()
  }

  /** Compact `db` to ~`targetBytes` per file. No-op (Result with
    * filesAfter == filesBefore) when the dataset already meets the
    * target with at most one file of slack.
    */
  def run(
      spark: SparkSession, db: String, targetBytes: Long = 128L << 20,
      cfg: BuildJob.Config = BuildJob.Config()
  ): Result = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = dataFiles(spark, db)
    val totalBytes = files.map(_.getLen).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (files.size <= want + 1) {
      val n = spark.read.schema(BuildJob.schema).parquet(db).count()
      return Result(files.size, files.size, n)
    }
    val meta = SidecarMeta.read(spark, db)
    val df = spark.read.schema(BuildJob.schema).parquet(db)
    val stage = db + "_compacting"
    df.repartitionByRange(want, col("hash"))
      .sortWithinPartitions("hash")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#hash", "true")
      .option("parquet.bloom.filter.expected.ndv#hash", cfg.bloomNdv.toString)
      .parquet(stage)

    val conf = spark.sessionState.newHadoopConf()
    val outPath = new Path(db)
    val fs = outPath.getFileSystem(conf)
    fs.delete(outPath, true)
    if (!fs.rename(new Path(stage), outPath))
      throw new java.io.IOException(s"failed to swap $stage into $db")

    val records = spark.read.schema(BuildJob.schema).parquet(db).count()
    meta.foreach { m =>
      SidecarMeta.write(spark, db, m)
      FooterMeta.write(spark, db, m)
    }
    Result(files.size, dataFiles(spark, db).size, records)
  }
}
