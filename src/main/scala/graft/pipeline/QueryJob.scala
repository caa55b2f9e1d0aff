package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sql.functions.{hashPrefixPredicate, hexLower}

/** Reverse-lookup semantics as a batch DataFrame job (reference
  * src/cli/query.rs:68-104 + src/storage/parquet.rs:476-570). The
  * reference's hand-rolled physical plan (bloom short-circuit → row-group
  * pruning → scan+filter+limit) is what Spark's parquet source does once
  * the predicate is a binary range: bloom check on equality, min/max
  * row-group pruning, early-terminating limit.
  */
object QueryJob {

  final case class Params(
      prefixHex: String,
      algorithm: Option[String] = None,
      limit: Int = 10
  ) {
    // P4: query input must hex-decode (reference src/cli/query.rs:69-70)
    require(prefixHex.matches("(?i)[0-9a-f]*") && prefixHex.length % 2 == 0,
      s"invalid hex hash prefix: $prefixHex")
  }

  /** Full-hash digest lengths (md5/ripemd160-hash160/sha256/sha512 —
    * reference parquet.rs:258-260): only these engage the footer bloom.
    */
  private def isFullHashLength(bytes: Int): Boolean =
    bytes == 16 || bytes == 20 || bytes == 32 || bytes == 64

  def run(spark: SparkSession, db: String, p: Params): DataFrame = {
    // Footer-bloom fast-reject for exact lookups (reference
    // parquet.rs:481-487): per FILE, a `shaha:bloom_*` bloom — present on
    // reference-built databases and on graft output finalized with
    // FooterMeta.writeBlooms — rejects files that cannot contain the
    // hash before any data page is opened. Files without a bloom are
    // scanned as before (native parquet column blooms + min/max pruning
    // still apply there). Cost: one driver-side ranged footer read per
    // file, only on the full-hash path — the same reads the reference
    // does per query.
    //
    // SOUNDNESS GATE the reference lacks: a full-hash-length probe can
    // simultaneously be a PREFIX of a longer algorithm's digest (the
    // range component of hashPrefixPredicate) — e.g. 32 hex chars is an
    // md5 exact probe AND a sha256 prefix. The bloom only answers the
    // exact component, so the fast-reject engages ONLY when no algorithm
    // in the db (per the query's algorithm filter, else the catalog) has
    // a digest longer than the probe. The reference applies its bloom
    // unconditionally (parquet.rs:481-487), which would wrongly return
    // empty for prefix-of-longer-digest lookups; we fall back to the
    // range-pruned scan instead.
    val prefixBytes = p.prefixHex.length / 2
    def noLongerDigests: Boolean = {
      val algos = p.algorithm.map(Seq(_))
        .orElse(SidecarMeta.read(spark, db).map(_.algorithms).filter(_.nonEmpty))
        .orElse(FooterMeta.read(spark, db).map(_.algorithms).filter(_.nonEmpty))
      algos.exists(as => as.nonEmpty && as.forall { a =>
        try graft.core.Hashers(a).digestLength <= prefixBytes
        catch { case _: IllegalArgumentException => false }
      })
    }
    if (isFullHashLength(prefixBytes) && noLongerDigests) {
      val hash = p.prefixHex.toLowerCase.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      val blooms = FooterMeta.readBlooms(spark, db)
      if (blooms.exists(_._2.isDefined)) {
        val surviving = blooms.collect {
          case (path, b) if b.forall(_.mightContain(hash)) => path.toString
        }
        if (surviving.isEmpty)
          // every file's bloom rejects: answer from metadata alone
          return spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            BuildJob.schema)
        if (surviving.size < blooms.size)
          return filterAndLimit(
            spark.read.schema(BuildJob.schema)
              .option("basePath", db).parquet(surviving: _*), p)
      }
    }
    filterAndLimit(spark.read.schema(BuildJob.schema).parquet(db), p)
  }

  private def filterAndLimit(df: DataFrame, p: Params): DataFrame = {
    // hive-partitioned dbs surface `algorithm` as a trailing partition
    // column — normalize to the reference's (hash, preimage, algorithm,
    // sources) order so positional consumers see one shape per layout
    val ordered = df.select("hash", "preimage", "algorithm", "sources")
    val base = ordered.filter(hashPrefixPredicate(col("hash"), p.prefixHex.toLowerCase))
    val filtered = p.algorithm match {
      case Some(a) => base.filter(col("algorithm") === a) // P3
      case None => base
    }
    filtered.limit(p.limit) // O2: early-terminating limit
  }

  /** R1: `preimage (algorithm, src1,src2)` plain format (query.rs:132-139). */
  def formatPlain(rows: Seq[(String, String, Seq[String])]): String =
    rows.map { case (pre, algo, srcs) => s"$pre ($algo, ${srcs.mkString(",")})" }
      .mkString("\n")

  /** R2: JSON format with hex-encoded hash (query.rs:141-163). */
  def formatJson(rows: Seq[(String, String, String, Seq[String])]): String =
    rows.map { case (hashHex, pre, algo, srcs) =>
      val srcJson = srcs.map(s => "\"" + SidecarMeta.escape(s) + "\"").mkString("[", ",", "]")
      s"""  {
         |    "hash": "$hashHex",
         |    "preimage": "${SidecarMeta.escape(pre)}",
         |    "algorithm": "$algo",
         |    "sources": $srcJson
         |  }""".stripMargin
    }.mkString("[\n", ",\n", "\n]")

  /** Collect + render, the driver-side tail of the reference CLI. */
  def render(spark: SparkSession, db: String, p: Params, format: String = "plain"): String = {
    val df = run(spark, db, p)
      .select(hexLower(col("hash")).as("hash"), col("preimage"), col("algorithm"), col("sources"))
    val rows = df.collect()
    val body = format match {
      case "json" =>
        formatJson(rows.toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getSeq[String](3))))
      case "table" =>
        // R3: fixed-width table (comfy-table analog, query.rs:165-179)
        val header = Seq("HASH", "PREIMAGE", "ALGORITHM", "SOURCES")
        val data = rows.toSeq.map(r => Seq(r.getString(0), r.getString(1), r.getString(2),
          r.getSeq[String](3).mkString(",")))
        val widths = (header +: data).transpose.map(_.map(_.length).max)
        (header +: data).map(row =>
          row.lazyZip(widths).map((c, w) => c.padTo(w, ' ')).mkString("| ", " | ", " |")
        ).mkString("\n")
      case _ =>
        formatPlain(rows.toSeq.map(r => (r.getString(1), r.getString(2), r.getSeq[String](3))))
    }
    // R6: result-count summary (query.rs:91-101)
    val n = rows.length
    s"$body${if (body.nonEmpty) "\n" else ""}Found $n result(s)"
  }
}
