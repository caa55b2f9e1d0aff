package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Blake3

/** Multimodal (image/audio/video) columns as opaque binary payloads with
  * typed metadata — the Spark plumbing a 100 TB media pipeline needs.
  *
  * Container layout (synthetic "GRFT" format, used by the specs since no
  * media codecs ship in this environment):
  *   bytes 0..3  magic "GRFT"
  *   byte  4     modality code (1=image, 2=audio, 3=video)
  *   bytes 5..8  width  (int32 BE)      bytes 9..12  height (int32 BE)
  *   bytes 13..16 frame count (int32 BE), then the payload.
  *
  * Design split:
  *  - header decode / frame slicing are PURE COLUMN FUNCTIONS
  *    (substring-on-binary + conv(hex(..))) — codegen'd, no shuffle, so
  *    metadata predicates (e.g. width > 512) push down before any
  *    expensive decode touches payload bytes;
  *  - the actual pixel/sample decode is an explicitly stubbed
  *    `mapPartitions` boundary with the exact batch shape a real decoder
  *    (or Arrow-batched Python UDF) would use — swap `decodeStub` for a
  *    codec and nothing else changes.
  */
object Multimodal {

  /** Canonical media-table shape produced by [[synthesize]] and expected
    * by [[describe]]/[[extractFeatures]].
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("modality", StringType, nullable = false)
  ))

  final val HeaderLen = 17

  /** Synthesize a media table from any text corpus (test/bench fixture —
    * the payload is the UTF-8 text, dimensions derived deterministically).
    * Pure column projection: header ints are rendered big-endian via
    * `unhex(lpad(hex(n)))`, so container assembly is codegen'd,
    * distributed, and shuffle-free at any corpus size.
    */
  def synthesize(docs: DataFrame): DataFrame = {
    def beInt(n: Column): Column = unhex(lpad(hex(n), 8, "0"))
    val code = col("doc_id") % 3 + 1
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        lit("GRFT".getBytes("US-ASCII")),
        unhex(lpad(hex(code), 2, "0")),
        beInt(lit(16) + col("doc_id") % 64),
        beInt(lit(16) + col("doc_id") % 48),
        beInt(when(code === 3, lit(4) + col("doc_id") % 8).otherwise(1)),
        encode(col("text"), "UTF-8")
      ).as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        code.cast("int")).as("modality"))
  }

  private def beInt(media: org.apache.spark.sql.Column, off: Int) =
    conv(hex(substring(media, off, 4)), 16, 10).cast("int")

  /** Typed metadata extracted from the header — pure projection. */
  def describe(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      decode(substring(media, 1, 4), "US-ASCII").as("magic"),
      conv(hex(substring(media, 5, 1)), 16, 10).cast("int").as("format_code"),
      beInt(media, 6).as("width"),
      beInt(media, 10).as("height"),
      beInt(media, 14).as("n_frames"),
      (length(media) - HeaderLen).as("payload_bytes")
    )

  /** Video frame sampling: one row per sampled frame with its byte range —
    * explode stays narrow; the (stubbed) decode then touches only sampled
    * slices.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 2): DataFrame = {
    val meta = describe(col("media"))
    media
      .withColumn("n_frames", meta.getField("n_frames"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          f => f % everyNth === 0)))
      .withColumn("frame_bytes",
        (length(col("media")) - HeaderLen) / greatest(col("n_frames"), lit(1)))
      .select(col("media_id"), col("frame_idx"),
        (lit(HeaderLen + 1) + col("frame_idx") * col("frame_bytes")).as("byte_offset"),
        col("frame_bytes"))
  }

  /** Stubbed columnar "resize" to (newW, newH): the header is rewritten
    * and a proportional prefix of the payload kept — a deterministic
    * stand-in for a real pixel resampler (which would slot into the
    * [[extractFeatures]] decode boundary instead). Everything here is
    * pure column functions over binary — codegen'd, shuffle-free, and
    * crucially BEFORE any decode: a pipeline that resizes then extracts
    * only ever decodes the downsampled bytes. The output container is
    * valid GRFT, so [[describe]]/[[sampleFrames]] compose downstream.
    */
  def resizeStub(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    def beIntLit(n: Int): Column = unhex(lpad(hex(lit(n)), 8, "0"))
    val w = beInt(col("media"), 6)
    val h = beInt(col("media"), 10)
    val plen = (length(col("media")) - HeaderLen).cast("long")
    val newLen = greatest(lit(1L),
      floor(plen * lit(newW.toLong * newH) / (w.cast("long") * h)).cast("long"))
    media
      .withColumn("_nl", newLen)
      .withColumn("media",
        concat(
          substring(col("media"), 1, 5), // magic + modality byte
          beIntLit(newW), beIntLit(newH),
          substring(col("media"), 14, 4), // frame count, unchanged
          expr(s"substring(media, ${HeaderLen + 1}, _nl)")))
      .drop("_nl")
  }

  final case class MediaFeatures(
      media_id: Long, modality: String, feature: Array[Float], checksum: String)

  /** Batched feature extraction at the decode boundary.
    *
    * STUB: a real deployment decodes `payload` with a codec (e.g. a JNI
    * imaging lib, or ship the bytes to an Arrow-batched Python UDF) and
    * runs a vision/audio model. None of those ship in this environment, so
    * the "decoder" is a deterministic fake: blake3(payload) → 4 floats.
    * The Spark-side shape — per-partition iteration, schema, narrow
    * plan — is the real thing and is what the spec pins.
    */
  def extractFeatures(media: DataFrame)(
      decode: Array[Byte] => Array[Float] = decodeStub
  ): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media", "modality").as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, modality) =>
          val payload = bytes.drop(HeaderLen)
          val feat = decode(payload)
          MediaFeatures(id, modality, feat,
            graft.core.Hashers.hex(Blake3.hash(payload)).take(16))
        }
      }
  }

  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, n_bytes: Int,
      feature: Array[Float], checksum: String)

  /** Per-frame feature extraction: sample every `everyNth` frame, slice
    * its bytes, and push each slice through the batched decode boundary —
    * the full media pipeline (header → frame ranges → decode) composed.
    *
    * Frame ranges use exact integer tiling (frame i spans payload bytes
    * [⌊i·P/n⌋, ⌊(i+1)·P/n⌋)): tiles cover the payload with no gaps or
    * rounding drift, all arithmetic stays in BIGINT, and any engine
    * reproduces the byte ranges bit-for-bit. ([[sampleFrames]] keeps the
    * fixed-stride double form — it mirrors a seek-by-duration access
    * pattern; this is the exact-split form a frame decoder wants.)
    * The slice is a codegen substring on binary — only sampled bytes
    * cross the decode boundary.
    */
  def frameFeatures(media: DataFrame, everyNth: Int = 2)(
      decode: Array[Byte] => Array[Float] = decodeStub
  ): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val meta = describe(col("media"))
    media
      .withColumn("n_frames", meta.getField("n_frames").cast("long"))
      // A header may declare zero frames on arbitrary GRFT input; without
      // this guard sequence(0, -1) descends to [0, -1] and DIV 0 below
      // yields a null slice that NPEs at the decode boundary.
      .filter(col("n_frames") >= 1)
      .withColumn("p_len", (length(col("media")) - HeaderLen).cast("long"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0L), col("n_frames") - 1),
          f => f % everyNth === 0)))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"""substring(media,
                 CAST($HeaderLen + 1 + (frame_idx * p_len) DIV n_frames AS INT),
                 CAST(((frame_idx + 1) * p_len) DIV n_frames
                      - (frame_idx * p_len) DIV n_frames AS INT))""").as("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, idx, bytes) =>
          FrameFeatures(id, idx, bytes.length, decode(bytes),
            graft.core.Hashers.hex(Blake3.hash(bytes)).take(16))
        }
      }
  }

  /** Deterministic stand-in for a real media decoder. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val h = Blake3.hash(payload)
    Array.tabulate(4) { i =>
      java.nio.ByteBuffer.wrap(h, i * 4, 4).getInt.toFloat / Int.MaxValue
    }
  }

  /** Perceptual average-hash (aHash) of the payload: the payload stream
    * is cut into 64 equal segments; bit k is set iff segment k's mean
    * value exceeds the global mean — the classic image-dedup fingerprint,
    * here over payload bytes (a real decoder would feed 8×8 downsampled
    * luma through the SAME shape). Near-identical payloads differ in few
    * bits, so Hamming distance ranks near-duplicates; feed the wide
    * output straight to `Dedup.bandedHammingPairs` (scale path) or
    * `Dedup.exactHammingPairs` (oracle twin).
    *
    * Every comparison is cross-multiplied BIGINT (`segSum·totalLen >
    * totalSum·segLen`) — no doubles, so a SQL engine replays the hash
    * bit-for-bit. Shape (r9): ONE per-row codegen kernel call
    * (`graft_ahash64`), zero shuffle — payload-linear and
    * embarrassingly parallel.
    *
    * Out: `doc_id, d1..d16, phash` (the [[graft.ops.Dedup.simhashWide]]
    * wide-nibble layout, media_id AS doc_id for the shared pair ops).
    */
  def aHashWide(media: DataFrame): DataFrame =
    aHashBits(media.select(col("media_id").as("doc_id"),
      expr(s"substring(media, ${HeaderLen + 1}, length(media))").as("_pay")))

  /** The shared 64-segment average-hash core over (doc_id, _pay binary)
    * rows — [[aHashWide]] feeds whole payloads, [[frameAHash]] feeds
    * per-frame slices. Zero-byte payloads are dropped (no segments to
    * vote; the SQL replay's empty generate_series drops them the same
    * way).
    *
    * r9: the hash runs as a native codegen kernel
    * ([[graft.sql.expressions.AHash64]], `graft_ahash64`) — the
    * previous explode→aggregate form paid a per-CHARACTER posexplode,
    * two aggregation exchanges and a join PER HASH; the kernel is a
    * pure per-row projection (zero shuffle), bit-identical per segment
    * (AHashSpec pins it against the original formulation), and d1..d16
    * / phash fall out of the returned long with shift/mask projections.
    */
  private def aHashBits(pays: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val hashed = pays
      .filter(length(col("_pay")) > 0)
      .select(col("doc_id"), GraftShim.column(
        graft.sql.expressions.AHash64(GraftShim.expression(
          decode(col("_pay"), "UTF-8")))).as("_h"))
    hashed.select(col("doc_id") +: (1 to 16).map(p =>
        shiftrightunsigned(col("_h"), 4 * (16 - p)).bitwiseAND(15L)
          .cast("int").as(s"d$p")): _*)
      .withColumn("phash",
        concat((1 to 16).map(p =>
          expr(s"substring('0123456789abcdef', d$p + 1, 1)")): _*))
  }

  /** Quantized DCT-II basis: cq(x, u) = floor(cos(π(2x+1)u/64)·10⁶),
    * x ∈ 0..31, u ∈ 0..7 — computed ONCE driver-side (the Benford /
    * nDCG integer-literal precedent) so both engines run pure BIGINT
    * sums; no trig call reaches a plan. Re-exported from the codegen
    * kernel's companion (the single definition) so the DuckDB oracle
    * literals and the kernel can never drift.
    */
  val dctBasisQ: Seq[(Int, Int, Long)] =
    graft.sql.expressions.DctHash64.basisQ

  /** DCT perceptual hash (pHash proper) — the frequency-domain sibling
    * of [[aHashWide]]: where the average hash votes on raw segment
    * brightness (fooled by any global level change in STRUCTURE), the
    * DCT hash votes on the low-frequency SHAPE of the signal, the
    * standard robust image fingerprint. Fully exact integer pipeline:
    *
    *   1. 32×32 gray matrix from payload bytes, g(x,y) = byte at
    *      (32x+y) mod n (the decode stub — a real decoder lands its
    *      luma plane in the same (x, y, g) shape);
    *   2. separable 2-D DCT-II through the [[dctBasisQ]] quantized
    *      basis: row stage Σ_x g·cq(x,u), column stage Σ_y r·cq(y,v) —
    *      BIGINT throughout (|C| ≤ 255·10¹²·1024 ≈ 2.7·10¹⁷);
    *   3. threshold each of the 64 coefficients against the MEDIAN of
    *      the 63 AC coefficients (rank 32 under the deterministic
    *      (c, u, v) order — exact, no averaging), DC included in the
    *      vote so the hash stays 64-bit;
    *   4. render 16 hex nibbles in (u, v) order.
    *
    * Invariances the spec pins: exact payload duplication (the mod-n
    * wrap makes g identical) and uniform brightness shift (+k moves
    * only the DC coefficient — at most 1 of 64 bits flips).
    *
    * Shape: a PURE PER-ROW PROJECTION (the rougeL precedent). r9: the
    * whole fold — gray matrix, both DCT stages, the rank-32 median
    * threshold, the non-ASCII `mod 256` clamp, and the hex render —
    * runs as ONE native codegen kernel
    * ([[graft.sql.expressions.DctHash64]], `graft_dct_hash64`),
    * replacing four chained interpreted `transform`/`aggregate` HOFs
    * over a 256-literal basis array whose analysis + interpreted eval
    * cost a FLAT ~2.8 s per run even on a 200-row input (measured at
    * sf0.001 and sf0.1 alike; DctHashSpec pins per-element equality of
    * kernel and reference fold). ZERO shuffle, zero joins, no window:
    * corpus-linear and embarrassingly parallel at any scale.
    *
    * Out: `(media_id, dct_hash)` — compose with the shared Hamming pair
    * ops via doc_id = media_id exactly like [[aHashWide]].
    */
  def dctHashWide(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    media
      .select(col("media_id"),
        expr(s"substring(media, ${HeaderLen + 1}, length(media))")
          .as("_pay"))
      .filter(length(col("_pay")) > 0)
      .withColumn("_s", decode(col("_pay"), "UTF-8"))
      .withColumn("dct_hash", GraftShim.column(
        graft.sql.expressions.DctHash64(
          GraftShim.expression(col("_s")))))
      .select(col("media_id"), col("dct_hash"))
  }

  /** Per-FRAME perceptual average-hash: every sampled frame of every
    * video gets its own 64-bit aHash, keyed `doc_id = media_id·1000 +
    * frame_idx` so the shared Hamming pair ops (`Dedup.
    * bandedHammingPairs` at scale, `exactHammingPairs` as the oracle
    * twin) apply unchanged — the frame-level candidate generator video
    * near-dup detection needs (re-uploads, re-encodes, clips share
    * FRAMES, not whole-file bytes). Frame ranges use the exact integer
    * tiling of [[frameFeatures]] (⌊i·P/n⌋ boundaries — BIGINT, engine-
    * replayable); the hash is the same cross-multiplied integer voting
    * as [[aHashWide]]. One explode (frames per video) + the bounded
    * segment aggregations; nothing corpus-quadratic until the pair op,
    * which brings its own banding/caps.
    */
  def frameAHash(media: DataFrame, everyNth: Int = 1): DataFrame = {
    val meta = describe(col("media"))
    aHashBits(media
      .withColumn("n_frames", meta.getField("n_frames").cast("long"))
      .filter(col("n_frames") >= 1)
      .withColumn("p_len", (length(col("media")) - HeaderLen).cast("long"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0L), col("n_frames") - 1),
          f => f % everyNth === 0)))
      .select(
        (col("media_id") * 1000 + col("frame_idx")).as("doc_id"),
        expr(s"""substring(media,
                 CAST($HeaderLen + 1 + (frame_idx * p_len) DIV n_frames AS INT),
                 CAST(((frame_idx + 1) * p_len) DIV n_frames
                      - (frame_idx * p_len) DIV n_frames AS INT))""")
          .as("_pay")))
  }

  /** Shot-boundary detection — the first structuring pass every video
    * curation pipeline runs (shot-level dedup, per-shot captioning,
    * keyframe selection all key off it): consecutive sampled frames'
    * perceptual hashes ([[frameAHash]]) are compared by Hamming
    * distance, a jump ≥ `thresholdBits` opens a new shot (hard-cut
    * detection by hash discontinuity — the content-based twin of the
    * histogram-difference classic), and frames merge into maximal shot
    * runs. Each media's first sampled frame always opens shot 1.
    *
    * All integer: the per-frame hash is the engine-replayable aHash,
    * the distance is `Σ bit_count(nibble ⊕ lag nibble)` over the 16
    * hash nibbles, and the shot id is a cumulative boundary count — so
    * a second engine reproduces the exact segmentation. Windows
    * partition by media over its own frames (bounded), the only
    * shuffle; videos shard freely across executors.
    *
    * Out: `(media_id, shot_id, start_frame, end_frame, n_frames)` —
    * frame indices are the SAMPLED indices (multiples of `everyNth`).
    */
  def shotBoundaries(media: DataFrame, everyNth: Int = 1,
      thresholdBits: Int = 16): DataFrame =
    framesWithShots(media, everyNth, thresholdBits)
      .groupBy("media_id", "shot_id")
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))

  /** The shot segmentation at FRAME granularity — `(media_id,
    * frame_idx, shot_id, d1..d16)` — shared by [[shotBoundaries]]
    * (rollup) and [[keyframes]] (within-shot medoid).
    */
  private def framesWithShots(media: DataFrame, everyNth: Int,
      thresholdBits: Int): DataFrame = {
    require(thresholdBits >= 1 && thresholdBits <= 64)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frameAHash(media, everyNth)
      .withColumn("media_id", expr("doc_id div 1000"))
      .withColumn("frame_idx", expr("pmod(doc_id, 1000)"))
      .withColumn("_prev",
        lag(struct((1 to 16).map(p => col(s"d$p")): _*), 1).over(w))
      .withColumn("_dist",
        when(col("_prev").isNull, lit(null))
          .otherwise((1 to 16).map(p =>
            expr(s"bit_count(d$p ^ _prev.d$p)")).reduce(_ + _).cast("long")))
      .withColumn("_nb",
        when(col("_prev").isNull || col("_dist") >= thresholdBits, 1L)
          .otherwise(0L))
      .withColumn("shot_id", sum(col("_nb")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(Seq(col("media_id"), col("frame_idx"), col("shot_id")) ++
        (1 to 16).map(p => col(s"d$p")): _*)
  }

  /** Keyframe selection — per shot, the MEDOID frame (minimum summed
    * Hamming distance to every frame of its own shot, ties → lowest
    * frame index): the representative a captioner/embedder runs on so
    * per-shot cost is one frame, not all of them. The medoid key is
    * the integer `Σdist·1000 + frame_idx` (frame indices < 1000 by the
    * frameAHash packing), so argmin is a plain `min` any engine
    * replays. The within-shot pair join is bounded by shot length² per
    * shot — shots are short by construction (a cut opens a new one),
    * and the join keys on (media, shot), never across media.
    *
    * Out: `(media_id, shot_id, keyframe_idx, n_frames, spread)` —
    * spread = the medoid's summed distance (0 for still shots).
    */
  def keyframes(media: DataFrame, everyNth: Int = 1,
      thresholdBits: Int = 16): DataFrame = {
    val f = framesWithShots(media, everyNth, thresholdBits)
      .localCheckpoint(true) // both sides of the within-shot pair join
    val ham = (1 to 16).map(p =>
      expr(s"bit_count(a.d$p ^ b.d$p)")).reduce(_ + _).cast("long")
    f.as("a").join(f.as("b"),
        expr("a.media_id = b.media_id AND a.shot_id = b.shot_id"))
      .select(col("a.media_id").as("media_id"),
        col("a.shot_id").as("shot_id"),
        col("a.frame_idx").as("frame_idx"), ham.as("_d"))
      .groupBy("media_id", "shot_id", "frame_idx")
      .agg(sum(col("_d")).as("_sum"))
      .groupBy("media_id", "shot_id")
      .agg(min(expr("_sum * 1000 + frame_idx")).as("_key"),
        count(lit(1)).as("n_frames"))
      .select(col("media_id"), col("shot_id"),
        expr("pmod(_key, 1000)").as("keyframe_idx"),
        col("n_frames"), expr("_key div 1000").as("spread"))
  }

  /** Energy-threshold voice-activity segmentation — the audio twin of
    * [[shotBoundaries]] and the first pass an audio curation pipeline
    * runs (silence stripping, utterance splitting before ASR, segment-
    * level dedup): the sample stream cuts into full `window`-sample
    * frames, each frame's energy (Σ codepoint values — the same
    * deterministic stand-in for amplitude the constellation op uses; a
    * real frontend feeds RMS through the identical shape) is compared
    * to the MEDIA'S OWN mean frame energy by cross-multiplication
    * (`E·F·1000 > θ‰·ΣE` — relative thresholding, so loud and quiet
    * recordings segment alike with no global calibration), and voiced
    * frames merge into maximal runs; sub-threshold gaps separate
    * segments. The trailing partial frame is dropped (full-frame VAD —
    * documented), and everything is integer, so a second engine
    * replays the exact segmentation.
    *
    * Shape: frame explode (window× fewer rows than samples), per-frame
    * energy as unrolled scalar adds (codegen, no HOF), one media-sized
    * totals join, one per-media lag window over voiced frames. Media
    * shard freely.
    *
    * Out: `(media_id, seg_id, start_frame, end_frame, n_frames)`.
    */
  def audioSegments(samples: DataFrame, window: Int = 16,
      thetaPermille: Long = 1000L): DataFrame = {
    require(window >= 2 && thetaPermille >= 1)
    val frames = samples
      .withColumn("_f", (length(col("s")) / window).cast("long"))
      .filter(col("_f") >= 1)
      .select(col("media_id"), col("_f"), col("s"),
        explode(sequence(lit(0L), col("_f") - 1)).as("w"))
      .withColumn("_frame", expr(s"substring(s, cast(w * $window + 1 as int), $window)"))
      .withColumn("_e", (1 to window).map(i =>
        ascii(substring(col("_frame"), i, 1)).cast("long")).reduce(_ + _))
      .select("media_id", "_f", "w", "_e")
    val tot = frames.groupBy("media_id").agg(sum(col("_e")).as("_te"))
    val voiced = frames.join(tot, "media_id")
      .filter(expr(s"_e * _f * 1000 > $thetaPermille * _te"))
    val byMedia = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("w")
    voiced
      .withColumn("_prev", lag(col("w"), 1).over(byMedia))
      .withColumn("_nb",
        when(col("_prev").isNull || col("w") > col("_prev") + 1, 1L)
          .otherwise(0L))
      .withColumn("seg_id", sum(col("_nb")).over(byMedia.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("media_id", "seg_id")
      .agg(min(col("w")).as("start_frame"), max(col("w")).as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** Constellation-style audio fingerprints (the landmark scheme of
    * Wang's "An Industrial-Strength Audio Search Algorithm", ISMIR 2003)
    * over a decoded sample stream `(media_id, s)`:
    *
    *   1. the stream is cut into fixed `window`-sample frames;
    *   2. per frame, energy accumulates into `bands` comb bands
    *      (sample position mod band — the deterministic stand-in for FFT
    *      bins; a real frontend feeds |FFT| magnitudes through the SAME
    *      shape);
    *   3. the peak band per frame is the frame's landmark (ties → lowest
    *      band, so the landmark is total-ordered and engine-replayable);
    *   4. each landmark pairs with the landmarks `deltas` frames ahead
    *      into tokens `peak₁·(bands·4) + peak₂·4 + Δ` — the hash key of
    *      the published constellation index.
    *
    * Everything is integer arithmetic over codepoints, so a SQL engine
    * replays the fingerprint bit-for-bit. Scale shape (r9): ONE native
    * codegen kernel call per media row emitting the full (w, token)
    * landmark set, then one explode — ZERO shuffle (every frame of a
    * media lives in its single payload row, so the former per-media
    * `lead()` window exchange moved no data that wasn't already
    * co-located; the kernel also subsumes the earlier regex frame
    * split, frame posexplode and unrolled energy/argmax chain, which
    * were themselves measured wins over sample-level explode and
    * interpreted-HOF formulations at 10× corpus). At 100 TB the token
    * domain comes from real FFT bins (≈2²⁰ values) and over-common
    * tokens are dropped by document frequency before indexing
    * (stop-token removal) — the frontend swaps at the kernel seam, the
    * plan is untouched.
    *
    * Out: `media_id, w (frame index), token`.
    */
  def audioFingerprints(samples: DataFrame, window: Int = 16, bands: Int = 8,
      deltas: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    // r9: the whole fold — framing, comb-band energies, first-max
    // landmark argmax, and Δ-token pairing — runs as one native codegen
    // kernel (graft_audio_tokens; requires and edge rules live there),
    // replacing a regex frame split + posexplode + window-wide unrolled
    // energy/argmax chain + the per-media `lead()` WINDOW EXCHANGE (the
    // plan's only shuffle) + 3-way token explode. All frames of a media
    // live in its one payload row, so token pairing never needed data
    // movement at all; fingerprinting is now a pure zero-shuffle
    // projection at any scale (AudioTokensSpec pins row-set equality
    // with the old formulation).
    samples
      .select(col("media_id"), GraftShim.column(
        graft.sql.expressions.AudioTokens(
          GraftShim.expression(col("s")), window, bands, deltas)).as("_wt"))
      .select(col("media_id"), explode(col("_wt")).as("_t"))
      .select(col("media_id"), col("_t.w").as("w"),
        col("_t.token").as("token"))
  }

  /** Query-by-snippet matching over constellation fingerprints: probe
    * tokens equi-join the track index on the token key (the inverted
    * index of the published scheme), and every hit votes for
    * `(probe, track, Δw = track frame − probe frame)`. A true match is a
    * diagonal in offset space — many tokens agreeing on ONE Δw — so the
    * vote count per (probe, track, Δw) is the match score and random
    * collisions spread thin across deltas. This is a structurally
    * different candidate generator from banded LSH: discrimination comes
    * from offset-coherence voting, not bucket collision.
    *
    * Scale shape: one equi-shuffle join on `token` plus one grouped
    * count with map-side partials; no cross join anywhere. Skewed hub
    * tokens are the known hazard at scale — the published fix (drop
    * high-df tokens at index build) composes upstream of this join.
    *
    * Out: `probe_id, media_id, delta_w, votes` for every pairing with
    * `votes ≥ minVotes`.
    */
  def audioMatch(index: DataFrame, probes: DataFrame,
      minVotes: Long = 8L): DataFrame =
    probes.select(col("media_id").as("probe_id"), col("w").as("pw"),
        col("token"))
      .join(index.select(col("media_id"), col("w").as("tw"), col("token")),
        "token")
      .groupBy(col("probe_id"), col("media_id"),
        (col("tw") - col("pw")).as("delta_w"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)

  /** Stop-token removal for the constellation index — the published
    * defense (Wang 2003 §loud-token pruning; the same move as stopword
    * removal in text retrieval) against HUB tokens: a token emitted by
    * a large fraction of all frames joins every probe against most of
    * the catalog, turning the [[audioMatch]] equi-join into a skewed
    * near-cross-product while contributing no discrimination (its votes
    * spread across all Δw). Dropping tokens whose document frequency
    * exceeds `maxDfBp` basis points of the index caps the join's
    * per-token fan-out by construction.
    *
    * RELATIVE cap (share of index entries), not absolute: token df
    * scales with corpus size, so a fixed count would drop everything at
    * 100 TB and nothing in a test fixture; a share threshold keeps the
    * semantics scale-invariant. The df table is TOKEN-DOMAIN-sized
    * (bands²·|deltas| here; ≈2²⁰ with a real FFT frontend — KBs either
    * way), so the keep-list join is broadcastable regardless of corpus
    * size, and the comparison is pure integer (df·10⁴ ≤ total·maxDfBp).
    */
  def dropHubTokens(fps: DataFrame, maxDfBp: Long = 200L): DataFrame = {
    require(maxDfBp > 0 && maxDfBp <= 10000, s"bad maxDfBp: $maxDfBp")
    val dfs = fps.groupBy("token").agg(count(lit(1)).as("_df"))
    val tot = dfs.agg(sum("_df").as("_tot"))
    val keep = dfs.crossJoin(broadcast(tot))
      .filter(col("_df") * 10000 <= col("_tot") * maxDfBp)
      .select("token")
    fps.join(keep, Seq("token"), "left_semi")
  }

  /** CLIP-style image–text alignment scoring — the LAION filter slot,
    * where a web-scale corpus of (image, caption) pairs is cut to the
    * pairs whose two modalities actually describe each other.
    *
    * STUB at the encoder boundary only: each side is embedded as its
    * `d`-segment byte-mean profile (exact-tiled like [[aHashWide]] — a
    * real deployment swaps BOTH encoders for model inference via
    * `mapInPandas`, leaving the melt/pivot/score plumbing untouched).
    * The alignment score is the PEARSON CORRELATION of the two
    * profiles — not raw cosine, which degenerates to ≈1 on byte-mean
    * vectors because they all sit near the global byte average;
    * centering is what makes a swapped caption visible.
    *
    * Engine-exact replay: segment sums/lengths are BIGINT (order-free),
    * the d-term dot products are FIXED-ORDER column expressions (not a
    * grouped float sum, which partition arrival order could move), and
    * the only irrational op is IEEE-exact `sqrt`. Score is quantized to
    * basis points.
    *
    * Scale shape: one payload-linear posexplode (both sides melted into
    * one pass), one (pair, side, segment) aggregation, one 2·d-column
    * pivot — no join wider than the pair key, no cross product. In:
    * `(media_id, media, caption)`. Out: `media_id, align_bp, matched`.
    */
  def alignmentScore(pairs: DataFrame, d: Int = 8,
      thresholdBp: Long = 9000L): DataFrame = {
    require(d >= 2, "need at least 2 segments for a correlation")
    val melted = pairs
      .select(col("media_id"),
        expr(s"substring(media, ${HeaderLen + 1}, length(media))").as("_pay"),
        col("caption"))
      .select(col("media_id"), explode(map(
        lit("img"), decode(col("_pay"), "UTF-8"),
        lit("txt"), col("caption"))).as(Seq("side", "s")))
      .filter(length(col("s")) >= d)
      .withColumn("_n", length(col("s")).cast("long"))
      .select(col("media_id"), col("side"), col("_n"),
        posexplode(split(col("s"), "")).as(Seq("pos", "c")))
      .withColumn("seg", expr(s"CAST(pos AS BIGINT) * $d DIV _n"))
      .withColumn("v", ascii(col("c")).cast("long"))
    val cells = melted.groupBy("media_id", "side", "seg")
      .agg(sum("v").as("ssum"), count(lit(1)).as("slen"))
    def cell(side: String, k: Int, c: String): Column =
      sum(when(col("side") === side && col("seg") === k, col(c))
        .otherwise(0L)).as(s"${side}_${c}_$k")
    val aggs = for {
      side <- Seq("img", "txt"); k <- 0 until d; c <- Seq("ssum", "slen")
    } yield cell(side, k, c)
    val wide = cells.groupBy("media_id").agg(aggs.head, aggs.tail: _*)
    def mean(side: String, k: Int): Column =
      col(s"${side}_ssum_$k").cast("double") / col(s"${side}_slen_$k")
    def sumExpr(terms: Seq[Column]): Column = terms.reduceLeft(_ + _)
    val sa = sumExpr((0 until d).map(mean("img", _)))
    val sb = sumExpr((0 until d).map(mean("txt", _)))
    val sab = sumExpr((0 until d).map(k => mean("img", k) * mean("txt", k)))
    val saa = sumExpr((0 until d).map(k => mean("img", k) * mean("img", k)))
    val sbb = sumExpr((0 until d).map(k => mean("txt", k) * mean("txt", k)))
    val va = lit(d.toDouble) * saa - sa * sa
    val vb = lit(d.toDouble) * sbb - sb * sb
    val r = when(va > 0.0 && vb > 0.0,
      (lit(d.toDouble) * sab - sa * sb) / (sqrt(va) * sqrt(vb)))
      .otherwise(lit(0.0))
    wide.select(col("media_id"),
      floor(r * 10000.0).cast("long").as("align_bp"))
      .withColumn("matched", col("align_bp") >= thresholdBp)
  }
}
