package graft.streaming

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Sketches

/** The heavy-hitter monitor's contracts: stream/batch parity against
  * the driver-side Misra–Gries fold over the same batch splits,
  * exactly-once under redelivery, crash-mid-write healing, and version
  * pruning.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  private def summaryMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("c")).toMap

  test("stream summary equals the batch-mode mgMerge fold over the same " +
    "batch boundaries; the planted heavy key survives every fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shh").toString
    val batches: Seq[Seq[String]] = Seq(
      Seq.fill(20)("HOT") ++ (0 until 15).map(i => s"a$i"),
      Seq.fill(10)("HOT") ++ (0 until 25).map(i => s"b${i % 12}"),
      (0 until 30).map(i => s"c${i % 18}") :+ "HOT")

    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.run(input.toDF().toDF("key"),
      col("key"), s"$dir/state", s"$dir/ckpt", k = 6)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = summaryMap(
      StreamingHeavyHitters.currentSummary(spark, s"$dir/state").get)

    // driver-side fold of the SAME splits through the batch ops: reduce
    // the first batch, then merge each subsequent batch's counts
    val first = Sketches.mgSubtract(batches.head.zipWithIndex
      .map { case (s, j) => (j.toLong, s) }.toDF("i", "key")
      .groupBy("key").agg(count(lit(1)).as("c")), k = 6)
    val expect = summaryMap(batches.tail.zipWithIndex.foldLeft(first) {
      case (prev, (b, i)) =>
        Sketches.mgMerge(prev, b.zipWithIndex
          .map { case (s, j) => ((i + 1) * 1000L + j, s) }.toDF("i", "key")
          .groupBy("key").agg(count(lit(1)).as("c")), k = 6)
    })
    assert(streamed == expect,
      s"stream $streamed must equal batch fold $expect")
    assert(streamed.contains("HOT"), s"heavy key lost: $streamed")
  }

  test("redelivery of a completed batch is a no-op; a crash mid-write " +
    "(incomplete version dir) heals to the identical summary; old " +
    "versions are pruned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shh-crash").toString
    val state = s"$dir/state"
    val fs = new Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batch(id: Long, rows: Seq[String]) = StreamingHeavyHitters
      .hitterBatch(rows.toDF("key"), col("key"), state, id, k = 3)

    val b0 = summaryMap(batch(0L, Seq.fill(5)("x") ++ Seq("y", "y", "z")))
    assert(b0 == Map("x" -> 5L, "y" -> 2L, "z" -> 1L))
    // redelivery: bit-identical, no new version
    assert(summaryMap(batch(0L, Seq("IGNORED"))) == b0,
      "completed batch must be skipped on redelivery")

    // crash mid-write of batch 1: an incomplete b1 dir without _SUCCESS
    fs.mkdirs(new Path(s"$state/b1"))
    fs.create(new Path(s"$state/b1/part-junk.parquet")).close()
    val healed = summaryMap(batch(1L, Seq.fill(4)("w") :+ "x"))
    // merge by hand: {x:5,y:2,z:1} + {w:4,x:1} → {x:6,w:4,y:2,z:1},
    // k=3 → 4th largest = 1 → {x:5, w:3, y:1}
    assert(healed == Map("x" -> 5L, "w" -> 3L, "y" -> 1L),
      s"healed summary wrong: $healed")
    assert(fs.exists(new Path(s"$state/b1/_SUCCESS")))

    // batch 2 prunes b0 (older than the immediate predecessor)
    batch(2L, Seq("x", "x"))
    assert(!fs.exists(new Path(s"$state/b0")), "b0 must be pruned")
    assert(fs.exists(new Path(s"$state/b1")), "predecessor must survive")
  }
}
