package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf("0.01")}/documents.parquet")
  private lazy val sh = Dedup.shingles(docs)

  test("sketch estimates track exact distinct counts within HLL error bounds") {
    val exact = sh.groupBy("doc_id").agg(countDistinct("w").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(sh, col("w"), Seq(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (id, est) =>
      val n = exact(id).toDouble
      // lgK=12 → RSE ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma + small-n slack
      assert(math.abs(est - n) <= math.max(3.0, n * 0.08),
        s"doc $id: est $est vs exact $n")
    }
  }

  test("merged per-source sketches estimate the corpus like a direct sketch") {
    // sketch per source (the daily-shard pattern), merge, estimate —
    // must equal sketching the whole corpus directly: merge is lossless
    val perSource = Sketches.distinctSketch(
      graft.queries.DedupShared.shingles(docs, col("source")),
      col("w"), Seq(col("source")))
    val merged = Sketches.mergeSketches(
      perSource.withColumn("all", lit(1)), Seq(col("all")))
      .select(Sketches.estimate(col("sketch")).as("est"))
      .head().getLong(0)
    val direct = Sketches.distinctSketch(
      sh.withColumn("all", lit(1)), col("w"), Seq(col("all")))
      .select(Sketches.estimate(col("sketch")).as("est"))
      .head().getLong(0)
    // the union gadget's registers can differ slightly from a
    // directly-built sketch (DataSketches HLL union targets HLL_8), so
    // the contract is estimate-closeness, not bit-equality
    assert(math.abs(merged - direct) <= direct * 0.02,
      s"merged $merged vs direct $direct")
    // and both track the exact corpus vocabulary
    val exact = sh.select(countDistinct("w")).head().getLong(0)
    assert(math.abs(merged - exact) <= exact * 0.08,
      s"merged $merged vs exact $exact")
    assert(math.abs(direct - exact) <= exact * 0.08,
      s"direct $direct vs exact $exact")
  }
}
