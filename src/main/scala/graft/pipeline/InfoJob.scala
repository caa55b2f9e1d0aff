package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `shaha info` equivalent (reference src/cli/info.rs:45-62): stats served
  * from the sidecar catalog without touching data (metadata fast path,
  * parquet.rs:572-582), falling back to an aggregate scan
  * (parquet.rs:353-394). Missing database → zeroed stats
  * (reference tests/integration.rs:462-469).
  */
object InfoJob {

  final case class Stats(
      totalRecords: Long,
      algorithms: Seq[String],
      sources: Seq[String],
      sizeBytes: Long
  )

  def run(spark: SparkSession, db: String): Stats = {
    val path = new org.apache.hadoop.fs.Path(db)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Stats(0L, Seq.empty, Seq.empty, 0L)
    val size = fs.getContentSummary(path).getLength

    // catalog precedence: our sidecar, then a reference-produced file's
    // shaha:* footer KV (FooterMeta), then the full aggregate scan
    SidecarMeta.read(spark, db).orElse(FooterMeta.read(spark, db)) match {
      case Some(m) => Stats(m.totalRecords, m.algorithms, m.sources, size)
      case None => // fallback full aggregate (A3, A4, A5)
        val row = spark.read.parquet(db).agg(
          count(lit(1)),
          sort_array(collect_set(col("algorithm"))),
          sort_array(array_distinct(flatten(collect_set(col("sources")))))
        ).head()
        Stats(row.getLong(0), row.getSeq[String](1), row.getSeq[String](2), size)
    }
  }

  /** R4: plain info rendering (reference src/cli/info.rs:64-113). */
  def formatPlain(s: Stats): String =
    s"""Total records: ${formatNumber(s.totalRecords)}
       |Algorithms: ${s.algorithms.mkString(", ")}
       |Sources: ${s.sources.mkString(", ")}
       |File size: ${formatBytes(s.sizeBytes)}""".stripMargin

  /** F4: thousands separator (reference src/cli/build.rs:374-387). */
  def formatNumber(n: Long): String =
    n.toString.reverse.grouped(3).mkString(",").reverse

  /** F5: human bytes (reference src/cli/info.rs:133-147). */
  def formatBytes(n: Long): String = {
    val units = Seq("B", "KB", "MB", "GB", "TB")
    var v = n.toDouble
    var u = 0
    while (v >= 1024.0 && u < units.length - 1) { v /= 1024.0; u += 1 }
    if (u == 0) s"$n B" else f"$v%.2f ${units(u)}"
  }
}
