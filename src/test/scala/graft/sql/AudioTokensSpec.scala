package graft.sql

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native constellation kernel (graft_audio_tokens) must emit the
  * same (media_id, w, token) row set as the split→explode→window
  * pipeline it replaced in Multimodal.audioFingerprints — same framing,
  * same comb-band energies with the short-tail zero rule, same
  * first-max landmark, same Δ-token pairing with lead()-null semantics
  * at the stream end. Verified against the ORIGINAL formulation,
  * verbatim, on random payloads incl. exact window multiples,
  * sub-window streams, and BMP non-ASCII code points.
  */
class AudioTokensSpec extends AnyFunSuite with SparkTestBase {

  private def kernel(rows: Seq[(Long, String)], window: Int = 16,
      bands: Int = 8): Set[(Long, Long, Long)] = {
    import spark.implicits._
    graft.ops.Multimodal.audioFingerprints(
        rows.toDF("media_id", "s"), window, bands)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  /** The pre-r9 formulation, verbatim. */
  private def original(rows: Seq[(Long, String)], window: Int = 16,
      bands: Int = 8): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val deltas = Seq(1, 2, 3)
    val reps = window / bands
    val frames = rows.toDF("media_id", "s").select(col("media_id"),
        posexplode(split(col("s"), s"(?<=\\G.{$window})")).as(Seq("w", "frame")))
      .filter(col("frame") =!= "" || col("w") === 0)
    val es = (0 until bands).map { b =>
      (0 until reps).map(r =>
        ascii(substring(col("frame"), b + r * bands + 1, 1)).cast("long"))
        .reduce(_ + _).as(s"_e$b")
    }
    val peakCol = (0 until bands - 1).foldRight(lit(bands - 1)) { (b, els) =>
      val beatsRest = (b + 1 until bands)
        .map(j => col(s"_e$b") >= col(s"_e$j")).reduce(_ && _)
      when(beatsRest, lit(b)).otherwise(els)
    }
    val peaks = frames
      .select(col("media_id") +: col("w").cast("long").as("w") +: es: _*)
      .withColumn("peak", peakCol)
      .select("media_id", "w", "peak")
    val ahead = Window.partitionBy("media_id").orderBy("w")
    val tokenCols = deltas.map { d =>
      (col("peak") * (bands * 4) + lead("peak", d).over(ahead) * 4 + d)
        .as(s"_t$d")
    }
    peaks.select(col("media_id") +: col("w") +: tokenCols: _*)
      .select(col("media_id"), col("w"),
        explode(array(deltas.map(d => col(s"_t$d")): _*)).as("token"))
      .filter(col("token").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
  }

  test("matches the original formulation on random and edge payloads") {
    val rnd = new scala.util.Random(31)
    // no '\n': the old regex framing (`.` excludes line terminators)
    // and the fixed framing agree only on newline-free streams — the
    // corpus contract both engines already rely on
    def randStr(len: Int) =
      Seq.fill(len)((32 + rnd.nextInt(95)).toChar).mkString
    val rows = Seq(
      (1L, randStr(400)),
      (2L, randStr(256)), // exact multiple of 16: phantom-frame rule
      (3L, randStr(17)), // one full + one 1-char frame
      (4L, randStr(7)), // sub-window stream: single short frame
      (5L, randStr(16)), // exactly one frame: no pairs
      (6L, ""), // empty stream: one empty frame, no pairs
      (7L, "héllöwörld ünïcode" * 20)) // BMP non-ASCII
    assert(kernel(rows) == original(rows))
    // a richer domain (bands=32, window=64 — the --audio-scale shape)
    val wide = Seq((1L, randStr(500)), (2L, randStr(64)))
    assert(kernel(wide, window = 64, bands = 32) ==
      original(wide, window = 64, bands = 32))
  }

  test("rejects invalid band/delta configs like the old op") {
    import spark.implicits._
    val df = Seq((1L, "abc")).toDF("media_id", "s")
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.audioFingerprints(df, window = 16, bands = 5)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.audioFingerprints(df, deltas = Seq(4))
    }
  }
}
