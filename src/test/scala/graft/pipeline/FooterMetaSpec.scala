package graft.pipeline

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import scala.jdk.CollectionConverters._

/** Footer-KV compat: a parquet file carrying the reference engine's
  * `shaha:*` footer metadata (reference src/storage/parquet.rs:20-26) is
  * readable without scanning data, and InfoJob prefers it over the scan.
  * The fixture is generated with parquet-hadoop's example writer — the
  * same footer KV mechanism the reference's ArrowWriter uses.
  */
class FooterMetaSpec extends AnyFunSuite with SparkTestBase {

  private val schema = MessageTypeParser.parseMessageType(
    """message hashrec {
      |  required binary hash;
      |  required binary preimage (STRING);
      |  required binary algorithm (STRING);
      |}""".stripMargin)

  /** Writes a reference-style file: rows + shaha:* footer KV. */
  private def writeFixture(dir: java.io.File, name: String,
      meta: Map[String, String], nRows: Int): Unit = {
    val w = ExampleParquetWriter.builder(new Path(s"$dir/$name"))
      .withType(schema)
      .withExtraMetaData(meta.asJava)
      .build()
    val f = new SimpleGroupFactory(schema)
    (0 until nRows).foreach { i =>
      w.write(f.newGroup()
        .append("hash", Binary.fromConstantByteArray(Array[Byte](i.toByte)))
        .append("preimage", s"word$i")
        .append("algorithm", "md5"))
    }
    w.close()
    // the example writer leaves a .crc next to the file; harmless
  }

  test("reads shaha:* footer metadata without touching data") {
    val dir = Files.createTempDirectory("footer").toFile
    writeFixture(dir, "db.parquet", Map(
      "shaha:total_records" -> "42",
      "shaha:algorithms" -> "md5,sha256",
      "shaha:sources" -> "rockyou.txt,common.txt",
      "shaha:source_hashes" -> """["abc\"123","def456"]""",
      "shaha:bloom_items" -> "42" // present but ignored
    ), nRows = 3)
    val m = FooterMeta.read(spark, s"$dir/db.parquet").get
    // footer says 42 even though the file has 3 rows — proves the fast
    // path served metadata, not a scan
    assert(m.totalRecords == 42L)
    assert(m.algorithms == Seq("md5", "sha256"))
    assert(m.sources == Seq("common.txt", "rockyou.txt"))
    assert(m.sourceHashes == Seq("abc\"123", "def456"))
  }

  test("directory form merges per-file footers; InfoJob takes the fast path") {
    val dir = Files.createTempDirectory("footerdir").toFile
    writeFixture(dir, "part-0.parquet", Map(
      "shaha:total_records" -> "10",
      "shaha:algorithms" -> "md5",
      "shaha:sources" -> "a.txt"), nRows = 2)
    writeFixture(dir, "part-1.parquet", Map(
      "shaha:total_records" -> "5",
      "shaha:algorithms" -> "sha256,md5",
      "shaha:sources" -> "b.txt"), nRows = 2)
    val m = FooterMeta.read(spark, dir.toString).get
    assert(m.totalRecords == 15L)
    assert(m.algorithms == Seq("md5", "sha256"))
    assert(m.sources == Seq("a.txt", "b.txt"))
    // InfoJob: no sidecar here, so stats must come from the footers
    // (total 15, not the 4 physical rows)
    val stats = InfoJob.run(spark, dir.toString)
    assert(stats.totalRecords == 15L)
    assert(stats.algorithms == Seq("md5", "sha256"))
  }

  test("files without shaha keys yield None (fallback to scan)") {
    val dir = Files.createTempDirectory("nofooter").toFile
    writeFixture(dir, "plain.parquet", Map("other:key" -> "1"), nRows = 2)
    assert(FooterMeta.read(spark, dir.toString).isEmpty)
    assert(FooterMeta.read(spark, s"$dir/missing").isEmpty)
    // (InfoJob's aggregate-scan fallback on catalog-less data is covered
    // by PipelineSpec against a full-schema database)
  }

  test("a graft-built database round-trips through the footer alone (write side)") {
    import spark.implicits._
    val out = Files.createTempDirectory("builtfooter").toFile + "/db"
    val words = (1 to 40).map(i => s"word$i").toDS()
    val res = BuildJob.run(spark, words, out,
      BuildJob.Config(algorithms = Seq("md5", "sha256"), sourceName = "unit.txt"),
      contentHash = Some("deadbeef"))
    assert(res.written && res.records == 80L)
    // remove the sidecar: the reference CLI never reads it — its metadata
    // fast path (parquet.rs:152-202) must find everything in the footers
    val sidecar = new java.io.File(out, SidecarMeta.FileName)
    assert(sidecar.delete(), "sidecar should have existed")
    val m = FooterMeta.read(spark, out).get
    assert(m.totalRecords == 80L) // per-file counts sum to the dataset total
    assert(m.algorithms == Seq("md5", "sha256"))
    assert(m.sources == Seq("unit.txt"))
    assert(m.sourceHashes == Seq("deadbeef"))
    // the rewrite must not have corrupted the data or its ordering
    val back = spark.read.parquet(out)
    assert(back.count() == 80L)
    assert(back.select("preimage").distinct().count() == 40L)
    // InfoJob now serves stats from footers, no sidecar needed
    val stats = InfoJob.run(spark, out)
    assert(stats.totalRecords == 80L)
  }

  test("footer write reaches files inside hive-partitioned layouts") {
    import spark.implicits._
    val out = Files.createTempDirectory("builtfooterpart").toFile + "/db"
    val words = (1 to 30).map(i => s"pword$i").toDS()
    val res = BuildJob.run(spark, words, out,
      BuildJob.Config(algorithms = Seq("md5", "sha256"),
        sourceName = "part.txt", partitionByAlgorithm = true))
    assert(res.written && res.records == 60L)
    assert(new java.io.File(out, SidecarMeta.FileName).delete())
    // files live under algorithm=md5/ and algorithm=sha256/ — the footer
    // stamp (and read) must walk the tree
    val m = FooterMeta.read(spark, out).get
    assert(m.totalRecords == 60L)
    assert(m.algorithms == Seq("md5", "sha256"))
    assert(m.sources == Seq("part.txt"))
    assert(spark.read.parquet(out).count() == 60L)
  }

  test("whole-footer interop: graft output and an independently-assembled " +
      "reference-style footer for the same words are byte-equivalent") {
    import spark.implicits._
    val out = Files.createTempDirectory("interopfooter").toFile + "/db"
    val words = (1 to 64).map(i => s"iw$i").toDS()
    val res = BuildJob.run(spark, words, out,
      BuildJob.Config(algorithms = Seq("md5"), sourceName = "interop.txt",
        numFiles = Some(1)),
      contentHash = Some("cafe01"))
    assert(res.written && res.records == 64L)
    assert(FooterMeta.writeBlooms(spark, out, minCapacity = 500) == 1)

    def kvOf(path: String): Map[String, String] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(path), spark.sessionState.newHadoopConf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
      finally r.close()
    }
    val dataFile = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .head
    val graftKv = kvOf(dataFile.toString).filter(_._1.startsWith("shaha:"))

    // assemble the SAME file's footer the way the reference writes it
    // (parquet.rs:444-461 formats), independently of graft's writers:
    // scalar keys from the build inputs, the bloom bitmap rebuilt from
    // scratch by an in-spec reimplementation of the bloomfilter-crate
    // layout — sip-1-3 over 8-byte-LE length-framed bytes, probes
    // g(i) = h0 + i·h1 mod the largest 64-bit prime, MSB-first bit
    // packing, base64. Only the pinned SipHash core (reference-vector
    // tested in SipHashSpec) is shared. Sip keys and bitmap geometry
    // ride in the footer in both engines (the reference draws keys
    // randomly), so the twin uses the file's own.
    val hashes = spark.read.parquet(out).select("hash").collect()
      .map(_.getAs[Array[Byte]](0))
    assert(hashes.length == 64)
    val keyParts = graftKv("shaha:bloom_keys").split(',')
      .map(java.lang.Long.parseUnsignedLong)
    val bitmapLen = java.util.Base64.getDecoder
      .decode(graftKv("shaha:bloom_bitmap")).length
    val bitmap = new Array[Byte](bitmapLen)
    val prime = 0xffffffffffffffc5L
    hashes.foreach { h =>
      val framed = new Array[Byte](8 + h.length)
      var j = 0
      while (j < 8) {
        framed(j) = ((h.length.toLong >>> (8 * j)) & 0xff).toByte; j += 1
      }
      System.arraycopy(h, 0, framed, 8, h.length)
      val h0 = graft.core.SipHash.hash13(keyParts(0), keyParts(1), framed)
      val h1 = graft.core.SipHash.hash13(keyParts(2), keyParts(3), framed)
      (0 until 7).foreach { i =>
        val g =
          if (i == 0) h0
          else if (i == 1) h1
          else java.lang.Long.remainderUnsigned(h0 + i.toLong * h1, prime)
        val idx = java.lang.Long.remainderUnsigned(g, bitmapLen * 8L)
        bitmap((idx >>> 3).toInt) =
          (bitmap((idx >>> 3).toInt) | (1 << (7 - (idx & 7)).toInt)).toByte
      }
    }
    val refKv = Map(
      "shaha:total_records" -> "64",
      "shaha:algorithms" -> "md5",
      "shaha:sources" -> "interop.txt",
      "shaha:source_hashes" -> "[\"cafe01\"]",
      "shaha:bloom_bitmap" ->
        java.util.Base64.getEncoder.encodeToString(bitmap),
      "shaha:bloom_keys" -> graftKv("shaha:bloom_keys"),
      "shaha:bloom_items" -> "64")

    // THE whole-footer assertion: identical key set, every value
    // string-equal — including the base64 bitmap (bit-level bloom
    // compatibility, not just probe-level agreement)
    assert(graftKv.keySet == refKv.keySet,
      s"key sets differ: graft-only ${graftKv.keySet -- refKv.keySet}, " +
        s"ref-only ${refKv.keySet -- graftKv.keySet}")
    refKv.foreach { case (k, v) =>
      assert(graftKv(k) == v, s"footer value for $k differs:\n" +
        s"  graft: ${graftKv(k).take(80)}\n  ref:   ${v.take(80)}")
    }

    // and a physical file carrying that reference footer reads back
    // through graft's fast paths identically
    val refDir = Files.createTempDirectory("interopref").toFile
    writeFixture(refDir, "ref.parquet", refKv, nRows = 1)
    val m = FooterMeta.read(spark, s"$refDir/ref.parquet").get
    assert(m.totalRecords == 64L && m.algorithms == Seq("md5") &&
      m.sources == Seq("interop.txt") && m.sourceHashes == Seq("cafe01"))
    val bloom = FooterBloom.fromKv(refKv).get
    assert(hashes.forall(bloom.mightContain),
      "every stored hash must pass the reference-footer bloom")
  }

  test("a sidecar catalog wins over footer metadata") {
    val dir = Files.createTempDirectory("precedence").toFile
    writeFixture(dir, "db.parquet", Map(
      "shaha:total_records" -> "42",
      "shaha:algorithms" -> "md5"), nRows = 1)
    SidecarMeta.write(spark, dir.toString,
      SidecarMeta(7L, Seq("sha512"), Seq("s.txt"), Seq.empty))
    val stats = InfoJob.run(spark, dir.toString)
    assert(stats.totalRecords == 7L)
    assert(stats.algorithms == Seq("sha512"))
  }
}
