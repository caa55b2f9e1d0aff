package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(60)
  private lazy val media = Multimodal.synthesize(docs).cache()

  test("header decode round-trips the synthesis parameters (pure projection)") {
    val decoded = media.select(col("media_id"), col("modality"),
      Multimodal.describe(col("media")).as("m"))
    val rows = decoded.select("media_id", "modality", "m.magic", "m.format_code",
      "m.width", "m.height", "m.n_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(2) == "GRFT")
      assert(r.getInt(3) == (id % 3 + 1).toInt)
      assert(r.getInt(4) == 16 + (id % 64).toInt)
      assert(r.getInt(5) == 16 + (id % 48).toInt)
      val expectFrames = if (r.getString(1) == "video") 4 + (id % 8).toInt else 1
      assert(r.getInt(6) == expectFrames)
    }
    // metadata decode must not shuffle: plan has no Exchange
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("metadata predicates filter before payload decode") {
    val wide = media.filter(Multimodal.describe(col("media")).getField("width") > 40)
    val n = wide.count()
    assert(n > 0 && n < media.count())
  }

  test("frame sampling explodes only video frames at the right offsets") {
    val videos = media.filter(col("modality") === "video")
    val frames = Multimodal.sampleFrames(videos, everyNth = 2).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val total = 4 + (id % 8).toInt
      assert(fs.length == (total + 1) / 2) // every 2nd frame
      assert(fs.map(_.getInt(1)).forall(_ % 2 == 0))
    }
  }

  test("feature extraction: deterministic stub, stable schema, batch shape") {
    val f1 = Multimodal.extractFeatures(media)().collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media)().collect().sortBy(_.media_id)
    assert(f1.length == media.count())
    assert(f1.zip(f2).forall { case (a, b) =>
      a.checksum == b.checksum && a.feature.sameElements(b.feature)
    })
    assert(f1.forall(_.feature.length == 4))
    assert(f1.forall(f => f.feature.forall(v => v >= -1.0f && v <= 1.0f)))
    // pluggable decoder boundary: swapping the stub changes features only
    val custom = Multimodal.extractFeatures(media)(p => Array(p.length.toFloat))
      .collect().sortBy(_.media_id)
    assert(custom.forall(_.feature.length == 1))
    assert(f1.map(_.checksum).toSeq == custom.map(_.checksum).toSeq)
  }

  test("resize emits valid containers that compose with describe and frames") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val media = Multimodal.synthesize(docs)
    val resized = Multimodal.resizeStub(media, 8, 8)
    val m = resized.select(col("media_id"),
        Multimodal.describe(col("media")).as("m"), length(col("media")).as("len"))
      .select("media_id", "m.magic", "m.width", "m.height", "m.n_frames",
        "m.payload_bytes", "len")
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[String]("magic") == "GRFT")
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 8)
      // payload really shrank to the area ratio (original dims >= 16x16)
      assert(r.getAs[Int]("payload_bytes") ==
        r.getAs[Int]("len") - Multimodal.HeaderLen)
    }
    val origBytes = media.select(sum(length(col("media")))).head().getLong(0)
    val newBytes = resized.select(sum(length(col("media")))).head().getLong(0)
    assert(newBytes < origBytes / 3, s"$newBytes vs $origBytes")
    // frame sampling still works on the resized container
    assert(Multimodal.sampleFrames(resized).count() > 0)
  }

  test("malformed containers degrade to nulls, not exceptions or garbage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "GRFT".getBytes("US-ASCII")), // header truncated after magic
      (2L, Array[Byte]()), // empty
      (3L, "XX".getBytes("US-ASCII"))) // not even a magic
      .toDF("media_id", "media")
    val out = rows.select(col("media_id"), Multimodal.describe(col("media")).as("m"))
      .select("media_id", "m.magic", "m.width", "m.payload_bytes")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getInt(3))).toMap
    // a 4-byte file still reads its magic; dims are null (no bytes), and
    // payload_bytes goes negative-of-header — callers filter on
    // magic = 'GRFT' AND width IS NOT NULL before trusting a row
    assert(out(1L)._1.contains("GRFT") && out(1L)._2.isEmpty)
    assert(out(2L)._2.isEmpty)
    assert(out(3L)._1.exists(_ != "GRFT"))
  }

  test("resize to larger dimensions clamps at the existing payload") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.synthesize(docs)
    val orig = media.select(col("media_id"),
        (length(col("media")) - Multimodal.HeaderLen).as("pb")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 128x128 exceeds every synthesized (w,h) ≤ 79x63 → ratio > 1
    val up = Multimodal.resizeStub(media, 128, 128)
      .select(col("media_id"), Multimodal.describe(col("media")).as("m"))
      .select("media_id", "m.width", "m.payload_bytes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    up.foreach { case (id, w, pb) =>
      assert(w == 128)
      assert(pb == orig(id), s"media $id: upscale must keep the full payload")
    }
  }

  test("frame features: integer tiling covers the payload exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((2L, "abcdefghij"), (5L, "xyz"), (8L, "0123456789abcdef"))
      .toDF("doc_id", "text") // doc_id % 3 == 2 → video, n_frames = 4+id%8
    val media = Multimodal.synthesize(docs)
    // everyNth=1: ALL frames — tiles must partition the payload exactly
    val all = Multimodal.frameFeatures(media, everyNth = 1)().collect()
    val byMedia = all.groupBy(_.media_id)
    val payloadLen = Map(2L -> 10, 5L -> 3, 8L -> 16)
    val nFrames = Map(2L -> 6, 5L -> 9, 8L -> 4) // 4 + doc_id % 8
    byMedia.foreach { case (id, fs) =>
      assert(fs.length == nFrames(id), s"media $id frame count")
      assert(fs.map(_.n_bytes).sum == payloadLen(id),
        s"media $id: tiles must sum to the payload")
      assert(fs.forall(_.n_bytes >= 0))
      // deterministic stub features: 4 floats + 16-hex checksum per frame
      assert(fs.forall(f => f.feature.length == 4 && f.checksum.length == 16))
    }
    // a known tile: doc 2, payload "abcdefghij" (10 bytes, 6 frames) —
    // frame 0 spans [0, ⌊10/6⌋) = 1 byte = "a"
    val f0 = all.find(f => f.media_id == 2L && f.frame_idx == 0).get
    assert(f0.n_bytes == 1)
    assert(f0.checksum == graft.core.Hashers.hex(
      graft.core.Blake3.hash("a".getBytes("UTF-8"))).take(16))
    // everyNth=2 keeps exactly the even frames
    val sampled = Multimodal.frameFeatures(media, everyNth = 2)().collect()
    assert(sampled.filter(_.media_id == 2L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 2, 4))
  }

  test("frame features: media declaring zero frames yields no rows, no NPE") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hand-build a GRFT container with n_frames = 0 (synthesize never
    // produces one, but the op accepts arbitrary input)
    def be(n: Int) = java.nio.ByteBuffer.allocate(4).putInt(n).array()
    val zeroFrames = "GRFT".getBytes("US-ASCII") ++ Array(3.toByte) ++
      be(16) ++ be(16) ++ be(0) ++ "payload".getBytes("UTF-8")
    val ok = "GRFT".getBytes("US-ASCII") ++ Array(3.toByte) ++
      be(16) ++ be(16) ++ be(2) ++ "abcd".getBytes("UTF-8")
    val media = Seq((1L, zeroFrames, "video"), (2L, ok, "video"))
      .toDF("media_id", "media", "modality")
    val out = Multimodal.frameFeatures(media, everyNth = 1)().collect()
    assert(out.forall(_.media_id == 2L), "zero-frame media must be dropped")
    assert(out.map(_.frame_idx).sorted.toSeq == Seq(0, 1))
  }

  test("aHash: locality + identical payloads; banded pairs ⊆ exact pairs") {
    import spark.implicits._
    import graft.ops.Dedup
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w100 w101 w102", "w100 wMUT w102")
    val far = (1 to 200).map(i => s"z${i * 7}").mkString(" ")
    val media = Multimodal.synthesize(Seq(
      (1L, base), (2L, nearDup), (3L, far), (4L, base)
    ).toDF("doc_id", "text"))
    val wide = Multimodal.aHashWide(media)
    val exact = Dedup.exactHammingPairs(wide, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical payloads → hamming 0; a one-token local edit moves only
    // the touched segments → small hamming; unrelated text stays far
    assert(exact.get((1L, 4L)).contains(0L), s"identical must be 0: $exact")
    assert(exact.contains((1L, 2L)) && exact((1L, 2L)) <= 10)
    assert(!exact.keySet.exists { case (i, j) => Set(i, j).contains(3L) },
      s"unrelated payload must not pair: $exact")
    // the banded LSH path may only MISS exact pairs, never invent them —
    // and a hamming-0 pair always shares every band
    val banded = Dedup.bandedHammingPairs(wide, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(banded.keySet.subsetOf(exact.keySet), s"banded invented: $banded")
    banded.foreach { case (k, h) => assert(exact(k) == h) }
    assert(banded.contains((1L, 4L)))
  }

  test("audio fingerprints: clip probes find their origin by offset voting") {
    import spark.implicits._
    // three "tracks" (distinct sample streams) + probes clipped from two
    // of them at a 64-sample offset (= 4 frames at the 16-sample window)
    val tracks = Seq(
      1L -> (1 to 400).map(i => ('a' + (i * 7) % 26).toChar).mkString,
      2L -> (1 to 400).map(i => ('a' + (i * 11) % 26).toChar).mkString,
      3L -> (1 to 400).map(i => ('a' + (i * 13) % 26).toChar).mkString
    ).toDF("media_id", "s")
    val probes = Seq(
      101L -> (1 to 400).map(i => ('a' + (i * 7) % 26).toChar).mkString.drop(64),
      102L -> (1 to 400).map(i => ('a' + (i * 11) % 26).toChar).mkString.drop(64)
    ).toDF("media_id", "s")
    val hits = Multimodal.audioMatch(
      Multimodal.audioFingerprints(tracks),
      Multimodal.audioFingerprints(probes)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // each probe's origin wins at delta_w = 4 with a dominant vote count
    val o1 = hits.getOrElse((101L, 1L, 4L), 0L)
    val o2 = hits.getOrElse((102L, 2L, 4L), 0L)
    assert(o1 >= 15L && o2 >= 15L, s"origin votes too low: $hits")
    hits.foreach { case ((p, t, d), v) =>
      val isOrigin = (p == 101L && t == 1L && d == 4L) ||
        (p == 102L && t == 2L && d == 4L)
      if (!isOrigin)
        assert(v < math.min(o1, o2),
          s"spurious alignment ($p,$t,$d)=$v rivals the origin votes")
    }
    // frame indices are contiguous, so lead()-based token pairing must
    // emit (windows − Δ) tokens per delta: verify the token count exactly
    val nWin = 400 / 16
    val perTrackTokens = Multimodal.audioFingerprints(tracks)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (nWin - 1) + (nWin - 2) + (nWin - 3)
    assert(perTrackTokens.values.forall(_ == expected.toLong),
      s"token count per track: $perTrackTokens, expected $expected")
  }

  test("alignmentScore: true captions score ~1, swapped captions fall off") {
    import spark.implicits._
    // 4 docs with visibly different byte profiles; pair 2 gets doc 3's
    // caption and vice versa — the filter must flag exactly those two
    val texts = Seq(
      1L -> ("aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj " * 4),
      2L -> ("zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk " * 5),
      3L -> ("1111 2222 3333 4444 5555 6666 7777 8888 9999 0000 " * 4),
      4L -> ("mixed MIXED Mixed mIxEd case CASE Case tokens here now " * 4)
    )
    val docs = texts.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val media = Multimodal.synthesize(docs)
    val caps = texts.map { case (id, t) =>
      val capOf = if (id == 2L) 3L else if (id == 3L) 2L else id
      (id, texts.toMap.apply(capOf), id == 2L || id == 3L)
    }.toDF("media_id", "caption", "swapped")
    val out = Multimodal.alignmentScore(media.join(caps, "media_id"), d = 16)
      .join(caps, "media_id")
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("align_bp"), r.getAs[Boolean]("matched"),
          r.getAs[Boolean]("swapped")))
      .toMap
    assert(out.size == 4)
    out.foreach { case (id, (bp, matched, swapped)) =>
      if (swapped) assert(!matched && bp < 9000, s"$id should be flagged: $bp")
      else assert(matched && bp >= 9990, s"$id should pass: $bp")
    }
  }

  test("frameAHash: one hash per frame; a tail rewrite inside the final " +
      "frame flips only that frame's hash") {
    import spark.implicits._
    // doc_id ≡ 2 (mod 3) → video container; ≡ 0 (mod 8) → 4 frames
    val text = (1 to 120).map(i => s"tok$i").mkString(" ")
    val docs = Seq((8L, text)).toDF("doc_id", "text")
    // same length (tile boundaries preserved), but the tail 100 chars —
    // inside the final frame — rewritten far from letter byte values
    val edited = Seq((3008L, text.dropRight(100) + "#" * 100))
      .toDF("doc_id", "text")
    val fa = Multimodal.frameAHash(
      Multimodal.synthesize(docs.unionByName(edited)), everyNth = 1)
      .collect().map(r => r.getLong(0) -> r.getString(17)).toMap
    // 4 frames per video, packed keys media_id*1000 + frame_idx
    assert(fa.keySet == Set(8000L, 8001L, 8002L, 8003L,
      3008000L, 3008001L, 3008002L, 3008003L), fa.keySet.toString)
    // identical tiles → identical hashes on frames 0-2; frame 3 differs
    (0 to 2).foreach(f =>
      assert(fa(8000L + f) == fa(3008000L + f), s"frame $f must match"))
    assert(fa(8003L) != fa(3008003L), "edited final frame must differ")
  }

  test("shotBoundaries: constant video is one shot, a hard cut splits at " +
      "the exact frame, shots partition the frames") {
    import spark.implicits._
    // doc_id 8 → video, 4 frames; constant payload → identical hashes
    val flat = Multimodal.shotBoundaries(Multimodal.synthesize(
      Seq((8L, "a" * 400)).toDF("doc_id", "text"))).collect()
    assert(flat.length == 1)
    assert(flat(0).getAs[Long]("start_frame") == 0L &&
      flat(0).getAs[Long]("end_frame") == 3L &&
      flat(0).getAs[Long]("n_frames") == 4L)

    // doc_id 14 → video, 10 frames of exactly 100 chars; frames 0-4
    // carry the z-then-a pattern, frames 5-9 the INVERTED pattern —
    // the per-frame mean-relative hash flips every bit at the cut
    val text = ("z" * 50 + "a" * 50) * 5 + ("a" * 50 + "z" * 50) * 5
    val cut = Multimodal.shotBoundaries(Multimodal.synthesize(
      Seq((14L, text)).toDF("doc_id", "text")))
      .collect().sortBy(_.getAs[Long]("shot_id"))
    assert(cut.length == 2, cut.mkString("; "))
    assert(cut(0).getAs[Long]("start_frame") == 0L &&
      cut(0).getAs[Long]("end_frame") == 4L &&
      cut(1).getAs[Long]("start_frame") == 5L &&
      cut(1).getAs[Long]("end_frame") == 9L)
    assert(cut.map(_.getAs[Long]("n_frames")).sum == 10L)
  }

  test("keyframes: the medoid frame represents the shot, ties go to the " +
      "earliest frame, still shots have zero spread") {
    import spark.implicits._
    // doc 8 → 4 frames of 100 chars: three identical A-frames + one
    // mildly different B-frame (boundary shifted 5 chars → a few bits,
    // far below the 16-bit cut threshold → ONE shot)
    val a = "z" * 50 + "a" * 50
    val b = "z" * 55 + "a" * 45
    val out = Multimodal.keyframes(Multimodal.synthesize(
      Seq((8L, a + a + a + b)).toDF("doc_id", "text"))).collect()
    assert(out.length == 1, out.mkString("; "))
    val r = out(0)
    // A-frames tie on summed distance (each d to B); frame 0 wins
    assert(r.getAs[Long]("keyframe_idx") == 0L)
    assert(r.getAs[Long]("n_frames") == 4L)
    assert(r.getAs[Long]("spread") > 0L, "A↔B must differ")

    // a still video: zero spread, keyframe 0
    val still = Multimodal.keyframes(Multimodal.synthesize(
      Seq((8L, a * 4)).toDF("doc_id", "text"))).collect()(0)
    assert(still.getAs[Long]("spread") == 0L &&
      still.getAs[Long]("keyframe_idx") == 0L)
  }

  test("audioSegments: voiced runs split on sub-threshold gaps, the " +
      "partial tail frame is dropped, quiet-only media yield nothing") {
    import spark.implicits._
    val loud = "z" * 16  // energy 122·16
    val quiet = " " * 16 // energy 32·16 — far under the mean
    // frames: L L q L q q L L L  → segments [0,1], [3,3], [6,8]
    val s1 = loud + loud + quiet + loud + quiet + quiet +
      loud + loud + loud + "zzz" // +3 chars of partial tail — ignored
    val segs = Multimodal.audioSegments(
      Seq((1L, s1), (2L, quiet * 4)).toDF("media_id", "s"))
      .collect().sortBy(r => (r.getAs[Long]("media_id"),
        r.getAs[Long]("seg_id")))
    // media 2 is all-quiet: every frame at the mean, strict > → silent
    assert(segs.forall(_.getAs[Long]("media_id") == 1L), segs.mkString(";"))
    assert(segs.map(r => (r.getAs[Long]("start_frame"),
      r.getAs[Long]("end_frame"), r.getAs[Long]("n_frames"))).toSeq ==
      Seq((0L, 1L, 2L), (3L, 3L, 1L), (6L, 8L, 3L)))
  }

  test("dropHubTokens: relative-df cap drops the hub, keeps the tail") {
    import spark.implicits._
    // token 1 carries 50/59 of the index (a hub); tokens 2..10 once each
    val fps = ((1 to 50).map(w => (1L, w.toLong, 1L)) ++
      (2 to 10).map(t => (2L, t.toLong, t.toLong)))
      .toDF("media_id", "w", "token")
    val kept = Multimodal.dropHubTokens(fps, maxDfBp = 5000)
      .select("token").as[Long].collect().toSeq.sorted
    assert(kept == (2L to 10L), s"hub must drop, tail must survive: $kept")
    // a cap above the hub's share keeps everything (boundary is <=)
    assert(Multimodal.dropHubTokens(fps, maxDfBp = 8500).count() == 59L)
  }

  test("dctHash: exact-duplication invariance, brightness shifts flip " +
    "at most the DC bit, distinct structures differ") {
    import spark.implicits._
    def hash(rows: Seq[(Long, String)]): Map[Long, String] =
      Multimodal.dctHashWide(Multimodal.synthesize(
          rows.toDF("doc_id", "text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String): Int =
      a.zip(b).map { case (x, y) =>
        Integer.bitCount(Integer.parseInt(x.toString, 16) ^
          Integer.parseInt(y.toString, 16))
      }.sum
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again with structure that varies across the line"
    val h = hash(Seq(
      (1L, base),
      (2L, base + " " + base + " "),     // NOT an exact wrap — differs
      (3L, base.map(c => (c + 1).toChar)), // uniform +1 brightness
      (4L, base.reverse)))
    // exact duplication: g(x,y) reads (32x+y) mod n — doubling the
    // payload EXACTLY reproduces the matrix. (media payload is the raw
    // text, so duplication must be exact: text*2, no separator)
    val hDup = hash(Seq((9L, base + base)))
    assert(h(1L) == hDup(9L), "mod-n wrap must make text*2 identical")
    // +1 on every byte moves only the DC coefficient: ≤ 1 bit flips
    assert(hamming(h(1L), h(3L)) <= 1,
      s"brightness shift flipped ${hamming(h(1L), h(3L))} bits")
    // genuinely different structure lands far away
    assert(hamming(h(1L), h(4L)) >= 8)
    assert(h(1L) != h(2L)) // near-copy with a seam is not bit-identical
  }
}
