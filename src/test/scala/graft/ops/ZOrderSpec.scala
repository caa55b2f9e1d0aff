package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The multi-column layout claim behind ZOrder: a Z-clustered table prunes
  * BOTH filter dimensions from per-file min/max stats, where a linear sort
  * prunes only its leading key. Pruning is counted the way a reader does:
  * a file is a candidate iff its [min,max] box intersects the predicate.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private def candidateFiles(
      dir: String, col1: String, lo1: Double, hi1: Double,
      col2: Option[(String, Double, Double)]): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(col1).cast("double")), max(col(col1).cast("double")),
          col2.map(c => min(col(c._1).cast("double"))).getOrElse(lit(0.0)),
          col2.map(c => max(col(c._1).cast("double"))).getOrElse(lit(0.0)))
        .head()
      val hit1 = r.getDouble(1) >= lo1 && r.getDouble(0) <= hi1
      val hit2 = col2.forall { case (_, lo2, hi2) =>
        r.getDouble(3) >= lo2 && r.getDouble(2) <= hi2 }
      hit1 && hit2
    }
  }

  test("z-order prunes both dimensions; linear sort only its leading key") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val dir = Files.createTempDirectory("graft-zorder")
    val zPath = s"$dir/z"
    val linPath = s"$dir/linear"
    ZOrder.writeClustered(ev, "user_id", "value", zPath, numFiles = 16)
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linPath)

    // predicate boxes: a narrow interior slice of each dimension, chosen
    // from the data itself (55th-65th percentile) so neither crosses a
    // domain edge
    val q = ev.agg(
      expr("percentile(user_id, 0.55)"), expr("percentile(user_id, 0.65)"),
      expr("percentile(value, 0.55)"), expr("percentile(value, 0.65)")).head()
    val (uLo, uHi, vLo, vHi) = (q.getDouble(0), q.getDouble(1), q.getDouble(2), q.getDouble(3))

    // trailing-dimension predicate (value only): the user_id-sorted layout
    // cannot prune it — every file spans the full value range
    val linValue = candidateFiles(linPath, "value", vLo, vHi, None)
    val zValue = candidateFiles(zPath, "value", vLo, vHi, None)
    assert(linValue >= 14, s"linear layout unexpectedly pruned value: $linValue")
    // a ~10-percentile slice sits in one value rank-quarter → 4 of the 16
    // Morton cells; range-partition boundary fragmentation can double that
    // (a cut inside a cell splits it across two files), so the bound is
    // half the files — against a linear layout that prunes nothing
    assert(zValue <= 8 && zValue < linValue,
      s"z-order should halve value-predicate candidates: $zValue vs $linValue")

    // leading-dimension predicate (user_id only): z-order keeps pruning
    // power there too (coarser than the dedicated sort, bounded, not all)
    val zUser = candidateFiles(zPath, "user_id", uLo, uHi, None)
    assert(zUser <= 8, s"z-order lost user pruning: $zUser of 16")

    // the 2-D box: intersecting few z files, and the QUERY RESULT is
    // layout-independent (same rows from both layouts)
    val zBox = candidateFiles(zPath, "user_id", uLo, uHi, Some(("value", vLo, vHi)))
    assert(zBox <= 6, s"2-D box should touch few z files: $zBox of 16")
    def rows(p: String) = spark.read.parquet(p)
      .filter(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(rows(zPath) == rows(linPath) && rows(zPath).nonEmpty)
  }

  test("zValue interleaves bits: curve locality on a known grid") {
    import spark.implicits._
    // 4-bit grid: z of (a,b) must equal the hand-computed Morton code
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (15L, 15L))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), bits = 4))
    def morton(a: Long, b: Long): Long =
      (0 until 4).map(i => (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))).sum
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((a, b), z) => assert(z == morton(a, b), s"($a,$b)") }
  }
}
