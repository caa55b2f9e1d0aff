package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class CompactSpec extends AnyFunSuite with SparkTestBase {

  test("compaction shrinks file count, keeps rows, layout, and catalogs") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/db"
    // a deliberately fragmented build: 1 record per file
    val words = (0 until 300).map(i => f"word-$i%04d").toDS()
    val cfg = BuildJob.Config(algorithms = Seq("md5"),
      maxRecordsPerFile = 10L, numFiles = Some(30), bloomNdv = 1000L)
    val res = BuildJob.run(spark, words, out, cfg, contentHash = Some("c1"))
    assert(res.written && res.records == 300)

    val compacted = Compact.run(spark, out, targetBytes = 512L << 20, cfg = cfg)
    assert(compacted.filesBefore == 30)
    assert(compacted.filesAfter == 1, s"got $compacted")
    assert(compacted.records == 300)

    // rows intact, still globally hash-sorted within the file
    val df = spark.read.schema(BuildJob.schema).parquet(out)
    assert(df.count() == 300)
    val hashes = df.orderBy("hash").select(hex(col("hash"))).collect()
      .map(_.getString(0))
    val asRead = df.select(hex(col("hash"))).collect().map(_.getString(0))
    assert(asRead.toSeq == hashes.toSeq, "compacted file must stay hash-sorted")

    // both catalogs survived the rewrite
    assert(SidecarMeta.read(spark, out).get.totalRecords == 300)
    val foot = FooterMeta.read(spark, out).get
    assert(foot.totalRecords == 300 && foot.sourceHashes.contains("c1"))

    // pruned lookup still works against the compacted layout
    val hexHash = graft.core.Hashers.hex(
      graft.core.Hashers("md5").hash("word-0042".getBytes("UTF-8")))
    val hit = QueryJob.run(spark, out, QueryJob.Params(hexHash)).collect()
    assert(hit.map(_.getString(1)).toSeq == Seq("word-0042"))

    // idempotent: already-compacted db is a no-op
    val again = Compact.run(spark, out, targetBytes = 512L << 20, cfg = cfg)
    assert(again.filesBefore == again.filesAfter)
  }
}
