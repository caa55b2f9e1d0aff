package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class StreamingCurateSpec extends AnyFunSuite with SparkTestBase {

  // long enough to clear the quality gate (≥100 tokens ≈ lenScore 1.0)
  private def goodText(prefix: String): String =
    (1 to 100).map(i => s"$prefix$i").mkString(" ")
  private val good = goodText("tok")
  // one token of 100 differs → Jaccard >> 0.8 vs good
  private val nearDup =
    ((1 to 99).map(i => s"tok$i") :+ "tokX").mkString(" ")

  test("gate: normalize feeds redaction feeds quality, and each gate drops") {
    import spark.implicits._
    val docs = Seq(
      // survives: messy bytes normalize away, PII redacts, quality high
      (1L, "en", "  MiXeD\t" + good + "  mail me x@y.com \r\n"),
      (2L, "de", good), // wrong language
      (3L, "en", "a a a a a a a a") // fails quality (no length/diversity/shape)
    ).toDF("doc_id", "lang", "text")
    val out = StreamingCurate.gate(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val text = out.head.getString(1)
    assert(text.startsWith("mixed tok1 "), s"normalize must run first: $text")
    assert(text.contains("<EMAIL>") && !text.contains("x@y.com"),
      "PII redaction must land in the stored text")
    assert(!text.contains("\t") && !text.contains("  "))
  }

  test("streaming: gates + cross-batch near-dup admission against stored state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scurate").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")

    val input = MemoryStream[(Long, String, String)]
    val query = StreamingCurate.run(
      input.toDF().toDF("doc_id", "lang", "text"), corpus, index, s"$dir/ckpt")
    try {
      // batch 1: one survivor (gates drop the other two)
      input.addData((1L, "en", good), (2L, "de", good), (3L, "en", "x y"))
      query.processAllAvailable()
      assert(spark.read.parquet(corpus).select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L))

      // batch 2: near-dup of batch-1's survivor rejects via the STORED
      // index; a novel doc and a wrong-lang near-dup behave per-gate
      // (lang gate drops doc 6 before dedup ever sees it)
      input.addData((4L, "en", nearDup), (5L, "en", goodText("novel")),
        (6L, "fr", nearDup))
      query.processAllAvailable()
      assert(spark.read.parquet(corpus).select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 5L))
    } finally query.stop()

    // the curated corpus holds gate-output text: batch semantics and
    // stream semantics agree doc-for-doc
    val stored = spark.read.parquet(corpus)
      .filter($"doc_id" === 1L).head.getAs[String]("text")
    assert(stored == good.toLowerCase)
  }

  test("curateBatch: crash between corpus and index appends self-heals, " +
      "and the ledger still adds up") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scurate-crash").toString
    val (corpus, index) = (s"$dir/corpus", s"$dir/index")

    // crash injection: a previous curateBatch died AFTER appending the
    // curated doc to the corpus but BEFORE appending its signatures —
    // the corpus holds gate-OUTPUT text (normalized), no index exists.
    // This is byte-for-byte the state StreamingCurate.run leaves when
    // the driver dies between admitBatch's two writes.
    Seq((1L, good.toLowerCase)).toDF("doc_id", "text")
      .write.format("parquet").save(corpus)

    // recovery batch: redelivery of doc 1 (at-least-once source), a
    // near-dup of the orphaned doc, and a wrong-lang doc. Healing must
    // (a) not duplicate doc 1, (b) backfill its signatures, (c) reject
    // the near-dup AGAINST the healed index, (d) keep the ledger
    // arithmetic (gated == admitted + rejectedNearDup) intact.
    val r = StreamingCurate.curateBatch(
      Seq((1L, "en", good), (4L, "en", nearDup), (9L, "zz", good))
        .toDF("doc_id", "lang", "text"),
      corpus, index)
    assert(r == StreamingCurate.CurateResult(
      ingested = 3, gated = 2, admitted = 0, rejectedNearDup = 2),
      s"redelivered orphan + its near-dup must both reject: $r")
    assert(spark.read.parquet(corpus).select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L),
      "redelivery must not duplicate the orphaned doc")
    assert(spark.read.parquet(index).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L),
      "healing must backfill the orphan's signatures")

    // a later batch behaves normally against the healed state
    val r2 = StreamingCurate.curateBatch(
      Seq((5L, "en", goodText("novel"))).toDF("doc_id", "lang", "text"),
      corpus, index)
    assert(r2 == StreamingCurate.CurateResult(1, 1, 1, 0))
    assert(spark.read.parquet(corpus).count() == 2)
    assert(spark.read.parquet(index).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
  }

  test("curateBatch counts: ingested/gated/admitted ledger adds up") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scurate-b").toString
    val r = StreamingCurate.curateBatch(
      Seq((1L, "en", good), (2L, "en", nearDup), (3L, "zz", good))
        .toDF("doc_id", "lang", "text"),
      s"$dir/corpus", s"$dir/index")
    assert(r == StreamingCurate.CurateResult(
      ingested = 3, gated = 2, admitted = 1, rejectedNearDup = 1))
  }
}
