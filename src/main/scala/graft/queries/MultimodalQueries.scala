package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.util.Tables

/** Multimodal binary-column plumbing exercised end-to-end. The header
  * metadata query is fully oracled: the GRFT container's dimensions are a
  * deterministic function of doc_id and the payload is the document's
  * UTF-8 bytes, so DuckDB recomputes the expected metadata independently
  * from `documents` — which value-checks the whole synthesize → binary
  * header → describe() round trip, not just our own readback. The feature
  * query is oracled on every non-blake3 column (DuckDB lacks blake3; the
  * checksum/feature VALUES are pinned by MultimodalSpec's known-answer
  * vectors instead).
  */
object MultimodalQueries extends QueryGroup {

  /** Shared DuckDB replay of [[Multimodal.aHashWide]] over the synthetic
    * payload (= the document's UTF-8 text), ending in `dig(media_id, p, d)`
    * with p = nibble index 0..15, d = nibble value. All cross-multiplied
    * BIGINT arithmetic — replays the hash bit-for-bit.
    */
  private val aHashCte: String =
    """pay AS (
      |  SELECT doc_id AS media_id, text AS s, length(text)::BIGINT AS n
      |  FROM documents WHERE doc_id < 200),
      |chars AS (
      |  SELECT media_id, n, i - 1 AS pos,
      |    ascii(substring(s, i, 1))::BIGINT AS v
      |  FROM pay, unnest(generate_series(1, CAST(n AS INTEGER))) AS g(i)),
      |segd AS (
      |  SELECT media_id, (pos * 64) // n AS seg,
      |    sum(v) AS ssum, count(*)::BIGINT AS slen
      |  FROM chars GROUP BY 1, 2),
      |tot AS (SELECT media_id, sum(ssum) AS tsum, sum(slen) AS tlen
      |        FROM segd GROUP BY 1),
      |bits AS (
      |  SELECT s.media_id, s.seg,
      |    (s.ssum * t.tlen > t.tsum * s.slen) AS bit
      |  FROM segd s JOIN tot t USING (media_id)),
      |dig AS (
      |  SELECT media_id, seg // 4 AS p,
      |    sum(CASE WHEN bit THEN 1 << CAST(3 - seg % 4 AS INTEGER)
      |        ELSE 0 END) AS d
      |  FROM bits GROUP BY 1, 2)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Perceptual average-hash per media item: 64 payload segments, bit =
    // segment mean > global mean, rendered as 16 hex nibbles. DuckDB
    // rebuilds the identical hash from the raw text.
    "q_multimodal_phash" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 200))
        Multimodal.aHashWide(media)
          .select(col("doc_id").as("media_id"), col("phash"))
          .orderBy("media_id")
      },
      Some(s"""WITH $aHashCte
              |SELECT media_id,
              |  string_agg(substring('0123456789abcdef',
              |    CAST(d AS INTEGER) + 1, 1), '' ORDER BY p) AS phash
              |FROM dig GROUP BY media_id ORDER BY media_id""".stripMargin)
    ),

    // DCT perceptual hash (pHash proper): 32×32 gray matrix from the
    // payload, exact-integer separable 2-D DCT through the quantized
    // driver-side basis, 64 bits voted against the exact rank-32 AC
    // median. Both engines run identical BIGINT sums — the hash replays
    // bit-for-bit, no trig call in either plan.
    "q_multimodal_dct_hash" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 200))
        Multimodal.dctHashWide(media).orderBy("media_id")
      },
      Some {
        val basisRows = Multimodal.dctBasisQ
          .map { case (x, u, c) => s"($x,$u,$c)" }.mkString(",")
        s"""WITH pay AS (
           |  SELECT doc_id AS media_id, text AS s,
           |    length(text)::BIGINT AS n
           |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
           |basis(bx, bu, cq) AS (VALUES $basisRows),
           |cells AS (
           |  SELECT media_id, (p - 1) // 32 AS x, (p - 1) % 32 AS y,
           |    ascii(substring(s, CAST((p - 1) % n AS INTEGER) + 1, 1))
           |      ::BIGINT AS g
           |  FROM pay, unnest(generate_series(1, 1024)) AS q(p)),
           |r1 AS (
           |  SELECT media_id, bu AS u, y, sum(g * cq) AS r
           |  FROM cells JOIN basis ON bx = x GROUP BY 1, 2, 3),
           |coef AS (
           |  SELECT media_id, u, b2.bu AS v,
           |    CAST(sum(r * b2.cq) AS BIGINT) AS c
           |  FROM r1 JOIN basis b2 ON b2.bx = r1.y GROUP BY 1, 2, 3),
           |med AS (
           |  SELECT media_id, c AS m FROM (
           |    SELECT media_id, c, row_number() OVER (
           |      PARTITION BY media_id ORDER BY c, u, v) AS rk
           |    FROM coef WHERE NOT (u = 0 AND v = 0)) WHERE rk = 32),
           |bits AS (
           |  SELECT coef.media_id, u * 8 + v AS idx, (c > m) AS bit
           |  FROM coef JOIN med USING (media_id)),
           |dig AS (
           |  SELECT media_id, idx // 4 AS p,
           |    sum(CASE WHEN bit THEN 1 << CAST(3 - idx % 4 AS INTEGER)
           |        ELSE 0 END) AS d
           |  FROM bits GROUP BY 1, 2)
           |SELECT media_id,
           |  string_agg(substring('0123456789abcdef',
           |    CAST(d AS INTEGER) + 1, 1), '' ORDER BY p) AS dct_hash
           |FROM dig GROUP BY media_id ORDER BY media_id""".stripMargin
      }
    ),

    // Video near-dup detection at FRAME granularity: originals + a
    // "re-upload" variant set (same frame count; the payload edit
    // REPLACES the last char, so length — and therefore every tile
    // boundary — is preserved and all but the final frame stay
    // byte-identical: the clips-share-frames structure the op exists
    // for), per-frame aHash via exact integer tiling, exact Hamming
    // pairs (oracle twin of the banded path), rolled up to video pairs
    // by shared-frame votes. The ≥400-char floor keeps frames long
    // enough for a 64-segment hash to discriminate (measured: below it,
    // degenerate few-char segments collide across unrelated videos; at
    // it, recovery is exact — every reupload pair, zero background).
    // DuckDB resynthesizes both sets, re-tiles, re-hashes, and replays
    // every pair and vote.
    "q_multimodal_video_dedup" -> QueryDef(
      (s, d) => {
        val base = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 2 && length(col("text")) >= 400)
        val orig = Multimodal.synthesize(base)
        // reupload ids at +960,000,000 (= 192 × 5M): disjoint from real
        // doc_ids at any SF (a low offset collides once the corpus
        // outgrows it and merges planted/organic frame sets identically
        // in both engines), and ≡ 0 mod lcm(3,8,64,48) = 192 so every
        // synthesize() header congruence (modality, n_frames, w, h) is
        // preserved on the shifted ids
        val reup = Multimodal.synthesize(
          base.withColumn("doc_id", col("doc_id") + 960000000L)
            .withColumn("text",
              concat(expr("substring(text, 1, length(text) - 1)"), lit("#"))))
        val fa = Multimodal.frameAHash(orig.unionByName(reup), everyNth = 1)
        // r9: banded candidates instead of the O(N²) blocked all-pairs —
        // EXACT here, not approximate: 8 bands of 8 bits and maxHamming
        // = 2 mean a qualifying pair differs in ≤ 2 bits, which touch
        // ≤ 2 bands, so ≥ 6 bands collide (pigeonhole) and recall is
        // 100% by construction; the uncapped bucket guard
        // (Int.MaxValue) drops nothing. Verified row-identical to
        // exactHammingPairs vs the all-pairs DuckDB oracle at all SFs.
        graft.ops.Dedup.bandedHammingPairs(fa, maxHamming = 2,
            maxBucket = Int.MaxValue)
          .withColumn("vid_i", expr("i div 1000"))
          .withColumn("vid_j", expr("j div 1000"))
          .filter(col("vid_i") =!= col("vid_j"))
          .groupBy("vid_i", "vid_j")
          .agg(count(lit(1)).as("n_frame_pairs"),
            min("hamming").as("min_hamming"),
            max("hamming").as("max_hamming"))
          .filter(col("n_frame_pairs") >= 3)
          .orderBy("vid_i", "vid_j")
      },
      Some {
        val dcols = (1 to 16).map(p =>
          s"sum(CASE WHEN p = ${p - 1} THEN d ELSE 0 END) AS d$p")
          .mkString(",\n    ")
        val ham = (1 to 16).map(p =>
          s"bit_count(xor(a.d$p, b.d$p))").mkString(" + ")
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE doc_id % 3 = 2 AND length(text) >= 400),
           |vids AS (
           |  SELECT doc_id AS media_id, text AS s, 4 + doc_id % 8 AS nf
           |  FROM base
           |  UNION ALL
           |  SELECT doc_id + 960000000,
           |    substring(text, 1, length(text) - 1) || '#', 4 + doc_id % 8
           |  FROM base),
           |frames AS (
           |  SELECT media_id, f.fi AS frame_idx,
           |    substring(s,
           |      CAST((fi * length(s)::BIGINT) // nf AS INTEGER) + 1,
           |      CAST(((fi + 1) * length(s)::BIGINT) // nf
           |           - (fi * length(s)::BIGINT) // nf AS INTEGER)) AS fs
           |  FROM vids, unnest(generate_series(0, nf - 1)) AS f(fi)),
           |chars AS (
           |  SELECT media_id, frame_idx, length(fs)::BIGINT AS n,
           |    i - 1 AS pos, ascii(substring(fs, i, 1))::BIGINT AS v
           |  FROM frames, unnest(generate_series(1, length(fs))) AS g(i)
           |  WHERE length(fs) > 0),
           |segd AS (
           |  SELECT media_id, frame_idx, (pos * 64) // n AS seg,
           |    sum(v) AS ssum, count(*)::BIGINT AS slen
           |  FROM chars GROUP BY 1, 2, 3),
           |tot AS (
           |  SELECT media_id, frame_idx, sum(ssum) AS tsum,
           |    sum(slen) AS tlen
           |  FROM segd GROUP BY 1, 2),
           |bits AS (
           |  SELECT s.media_id, s.frame_idx, s.seg,
           |    (s.ssum * t.tlen > t.tsum * s.slen) AS bit
           |  FROM segd s JOIN tot t USING (media_id, frame_idx)),
           |dig AS (
           |  SELECT media_id, frame_idx, seg // 4 AS p,
           |    sum(CASE WHEN bit THEN 1 << CAST(3 - seg % 4 AS INTEGER)
           |        ELSE 0 END) AS d
           |  FROM bits GROUP BY 1, 2, 3),
           |wide AS (
           |  SELECT media_id, frame_idx, media_id * 1000 + frame_idx AS pid,
           |    $dcols
           |  FROM dig GROUP BY 1, 2),
           |fpairs AS (
           |  SELECT a.media_id AS vid_i, b.media_id AS vid_j,
           |    CAST($ham AS BIGINT) AS h
           |  FROM wide a JOIN wide b ON a.pid < b.pid
           |  WHERE a.media_id <> b.media_id)
           |SELECT vid_i, vid_j, CAST(count(*) AS BIGINT) AS n_frame_pairs,
           |  min(h) AS min_hamming, max(h) AS max_hamming
           |FROM fpairs WHERE h <= 2
           |GROUP BY 1, 2 HAVING count(*) >= 3
           |ORDER BY vid_i, vid_j""".stripMargin
      }
    ),

    // Shot segmentation by per-frame perceptual-hash discontinuity:
    // consecutive frame aHashes, nibble-XOR Hamming jumps ≥ 16 bits open
    // shots, frames merge into maximal runs — both engines rebuild the
    // hashes, the lag distances, AND the cumulative shot ids.
    "q_multimodal_shots" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d)
            .filter(col("doc_id") % 3 === 2 && col("doc_id") < 600))
        Multimodal.shotBoundaries(media, everyNth = 1, thresholdBits = 16)
          .orderBy("media_id", "shot_id")
      },
      Some {
        val dcols = (1 to 16).map(p =>
          s"sum(CASE WHEN p = ${p - 1} THEN d ELSE 0 END) AS d$p")
          .mkString(",\n    ")
        val lags = (1 to 16).map(p =>
          s"lag(d$p) OVER w AS l$p").mkString(",\n    ")
        val ham = (1 to 16).map(p =>
          s"bit_count(xor(d$p, l$p))").mkString(" + ")
        s"""WITH vids AS (
           |  SELECT doc_id AS media_id, text AS s, 4 + doc_id % 8 AS nf
           |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 600),
           |frames AS (
           |  SELECT media_id, f.fi AS frame_idx,
           |    substring(s,
           |      CAST((fi * length(s)::BIGINT) // nf AS INTEGER) + 1,
           |      CAST(((fi + 1) * length(s)::BIGINT) // nf
           |           - (fi * length(s)::BIGINT) // nf AS INTEGER)) AS fs
           |  FROM vids, unnest(generate_series(0, nf - 1)) AS f(fi)),
           |chars AS (
           |  SELECT media_id, frame_idx, length(fs)::BIGINT AS n,
           |    i - 1 AS pos, ascii(substring(fs, i, 1))::BIGINT AS v
           |  FROM frames, unnest(generate_series(1, length(fs))) AS g(i)
           |  WHERE length(fs) > 0),
           |segd AS (
           |  SELECT media_id, frame_idx, (pos * 64) // n AS seg,
           |    sum(v) AS ssum, count(*)::BIGINT AS slen
           |  FROM chars GROUP BY 1, 2, 3),
           |tot AS (
           |  SELECT media_id, frame_idx, sum(ssum) AS tsum,
           |    sum(slen) AS tlen
           |  FROM segd GROUP BY 1, 2),
           |bits AS (
           |  SELECT s.media_id, s.frame_idx, s.seg,
           |    (s.ssum * t.tlen > t.tsum * s.slen) AS bit
           |  FROM segd s JOIN tot t USING (media_id, frame_idx)),
           |dig AS (
           |  SELECT media_id, frame_idx, seg // 4 AS p,
           |    sum(CASE WHEN bit THEN 1 << CAST(3 - seg % 4 AS INTEGER)
           |        ELSE 0 END) AS d
           |  FROM bits GROUP BY 1, 2, 3),
           |wide AS (
           |  SELECT media_id, frame_idx,
           |    $dcols
           |  FROM dig GROUP BY 1, 2),
           |lagd AS (
           |  SELECT media_id, frame_idx,
           |    ${(1 to 16).map(p => s"d$p").mkString(", ")},
           |    $lags
           |  FROM wide
           |  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
           |dist AS (
           |  SELECT media_id, frame_idx,
           |    CASE WHEN l1 IS NULL THEN NULL
           |         ELSE $ham END AS dd
           |  FROM lagd),
           |sh AS (
           |  SELECT media_id, frame_idx,
           |    CAST(sum(CASE WHEN dd IS NULL OR dd >= 16 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY media_id ORDER BY frame_idx
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS shot_id
           |  FROM dist)
           |SELECT media_id, shot_id,
           |  CAST(min(frame_idx) AS BIGINT) AS start_frame,
           |  CAST(max(frame_idx) AS BIGINT) AS end_frame,
           |  CAST(count(*) AS BIGINT) AS n_frames
           |FROM sh GROUP BY 1, 2
           |ORDER BY media_id, shot_id""".stripMargin
      }
    ),

    // Per-shot medoid keyframes: within each detected shot, the frame
    // minimizing summed Hamming distance to its shot-mates (ties → the
    // earliest frame, via the injective Σdist·1000+frame min key) —
    // both engines rebuild shots, all within-shot pair distances, and
    // the medoid choice.
    "q_multimodal_keyframes" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d)
            .filter(col("doc_id") % 3 === 2 && col("doc_id") < 600))
        Multimodal.keyframes(media, everyNth = 1, thresholdBits = 16)
          .orderBy("media_id", "shot_id")
      },
      Some {
        val dcols = (1 to 16).map(p =>
          s"sum(CASE WHEN p = ${p - 1} THEN d ELSE 0 END) AS d$p")
          .mkString(",\n    ")
        val lags = (1 to 16).map(p =>
          s"lag(d$p) OVER w AS l$p").mkString(",\n    ")
        val hamL = (1 to 16).map(p =>
          s"bit_count(xor(d$p, l$p))").mkString(" + ")
        val hamAb = (1 to 16).map(p =>
          s"bit_count(xor(a.d$p, b.d$p))").mkString(" + ")
        s"""WITH vids AS (
           |  SELECT doc_id AS media_id, text AS s, 4 + doc_id % 8 AS nf
           |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 600),
           |frames AS (
           |  SELECT media_id, f.fi AS frame_idx,
           |    substring(s,
           |      CAST((fi * length(s)::BIGINT) // nf AS INTEGER) + 1,
           |      CAST(((fi + 1) * length(s)::BIGINT) // nf
           |           - (fi * length(s)::BIGINT) // nf AS INTEGER)) AS fs
           |  FROM vids, unnest(generate_series(0, nf - 1)) AS f(fi)),
           |chars AS (
           |  SELECT media_id, frame_idx, length(fs)::BIGINT AS n,
           |    i - 1 AS pos, ascii(substring(fs, i, 1))::BIGINT AS v
           |  FROM frames, unnest(generate_series(1, length(fs))) AS g(i)
           |  WHERE length(fs) > 0),
           |segd AS (
           |  SELECT media_id, frame_idx, (pos * 64) // n AS seg,
           |    sum(v) AS ssum, count(*)::BIGINT AS slen
           |  FROM chars GROUP BY 1, 2, 3),
           |tot AS (
           |  SELECT media_id, frame_idx, sum(ssum) AS tsum,
           |    sum(slen) AS tlen
           |  FROM segd GROUP BY 1, 2),
           |bits AS (
           |  SELECT s.media_id, s.frame_idx, s.seg,
           |    (s.ssum * t.tlen > t.tsum * s.slen) AS bit
           |  FROM segd s JOIN tot t USING (media_id, frame_idx)),
           |dig AS (
           |  SELECT media_id, frame_idx, seg // 4 AS p,
           |    sum(CASE WHEN bit THEN 1 << CAST(3 - seg % 4 AS INTEGER)
           |        ELSE 0 END) AS d
           |  FROM bits GROUP BY 1, 2, 3),
           |wide AS MATERIALIZED (
           |  SELECT media_id, frame_idx,
           |    $dcols
           |  FROM dig GROUP BY 1, 2),
           |lagd AS (
           |  SELECT media_id, frame_idx,
           |    ${(1 to 16).map(p => s"d$p").mkString(", ")},
           |    $lags
           |  FROM wide
           |  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
           |dist AS (
           |  SELECT media_id, frame_idx,
           |    CASE WHEN l1 IS NULL THEN NULL
           |         ELSE $hamL END AS dd
           |  FROM lagd),
           |sh AS (
           |  SELECT media_id, frame_idx,
           |    CAST(sum(CASE WHEN dd IS NULL OR dd >= 16 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY media_id ORDER BY frame_idx
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS shot_id
           |  FROM dist),
           |sh2 AS MATERIALIZED (
           |  SELECT s.media_id, s.frame_idx, s.shot_id,
           |    ${(1 to 16).map(p => s"w.d$p").mkString(", ")}
           |  FROM sh s JOIN wide w USING (media_id, frame_idx)),
           |fp AS (
           |  SELECT a.media_id, a.shot_id, a.frame_idx,
           |    CAST(sum($hamAb) AS BIGINT) AS sd
           |  FROM sh2 a JOIN sh2 b
           |    ON a.media_id = b.media_id AND a.shot_id = b.shot_id
           |  GROUP BY 1, 2, 3),
           |k AS (
           |  SELECT media_id, shot_id,
           |    CAST(min(sd * 1000 + frame_idx) AS BIGINT) AS key,
           |    CAST(count(*) AS BIGINT) AS n_frames
           |  FROM fp GROUP BY 1, 2)
           |SELECT media_id, shot_id, key % 1000 AS keyframe_idx,
           |  n_frames, key // 1000 AS spread
           |FROM k ORDER BY media_id, shot_id""".stripMargin
      }
    ),

    // Perceptual near-dup pairs by exact Hamming distance over the
    // aHash (blocked equi-join — the oracle twin of the banded LSH path,
    // which MultimodalSpec bounds against this). DuckDB computes the
    // same all-pairs hamming from its replayed nibbles.
    "q_multimodal_phash_pairs" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 200))
        graft.ops.Dedup.exactHammingPairs(
            Multimodal.aHashWide(media), maxHamming = 15)
          .orderBy("i", "j")
      },
      Some {
        val dcols = (1 to 16).map(p =>
          s"sum(CASE WHEN p = ${p - 1} THEN d ELSE 0 END) AS d$p")
          .mkString(",\n    ")
        val ham = (1 to 16).map(p =>
          s"bit_count(xor(a.d$p, b.d$p))").mkString(" + ")
        s"""WITH $aHashCte,
           |wide AS (
           |  SELECT media_id,
           |    $dcols
           |  FROM dig GROUP BY media_id)
           |SELECT i, j, hamming FROM (
           |  SELECT a.media_id AS i, b.media_id AS j,
           |    CAST($ham AS BIGINT) AS hamming
           |  FROM wide a JOIN wide b ON a.media_id < b.media_id)
           |WHERE hamming <= 15 ORDER BY i, j""".stripMargin
      }
    ),

    // Synthesize media payloads, decode headers, aggregate per modality.
    "q_multimodal_meta" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(Tables.documents(s, d))
        media
          .select(col("modality"), Multimodal.describe(col("media")).as("m"))
          .groupBy("modality")
          .agg(
            count(lit(1)).as("n"),
            sum(col("m.payload_bytes")).as("total_payload"),
            max(col("m.width")).as("max_width"),
            sum(col("m.n_frames")).as("total_frames"))
          .orderBy("modality")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    (doc_id % 3 + 1) AS code,
             |    16 + (doc_id % 64) AS width,
             |    CASE WHEN doc_id % 3 + 1 = 3 THEN 4 + (doc_id % 8) ELSE 1 END
             |      AS n_frames,
             |    octet_length(encode(text)) AS payload_bytes
             |  FROM documents)
             |SELECT CASE code WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
             |    ELSE 'video' END AS modality,
             |  count(*) AS n,
             |  CAST(sum(payload_bytes) AS BIGINT) AS total_payload,
             |  CAST(max(width) AS INTEGER) AS max_width,
             |  CAST(sum(n_frames) AS BIGINT) AS total_frames
             |FROM m GROUP BY 1 ORDER BY modality""".stripMargin)
    ),

    // Stubbed feature extraction through the batched mapPartitions decode
    // boundary, now oracled: the compared projection carries everything
    // DuckDB can recompute — header dimensions, payload size, and the
    // SHAPE of the extracted features (dim 4, 16-hex checksum) — while the
    // blake3-derived values themselves stay out of the projection (DuckDB
    // lacks blake3; MultimodalSpec pins them with known-answer vectors).
    // The decode still runs for every row: feature_dim/checksum_len are
    // computed FROM the mapPartitions output, which no optimizer can
    // prune through the deserialization boundary.
    "q_multimodal_features" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 200))
        val feats = Multimodal.extractFeatures(media)()
          .toDF()
          .select(col("media_id"), col("modality"),
            size(col("feature")).as("feature_dim"),
            length(col("checksum")).as("checksum_len"))
        val meta = media.select(col("media_id"),
            Multimodal.describe(col("media")).as("m"))
          .select(col("media_id"), col("m.width").as("width"),
            col("m.n_frames").as("n_frames"),
            col("m.payload_bytes").as("payload_bytes"))
        feats.join(meta, "media_id").orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE doc_id % 3 + 1 WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
             |    ELSE 'video' END AS modality,
             |  CAST(4 AS INTEGER) AS feature_dim,
             |  CAST(16 AS INTEGER) AS checksum_len,
             |  CAST(16 + doc_id % 64 AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 3 + 1 = 3 THEN 4 + doc_id % 8 ELSE 1 END
             |    AS INTEGER) AS n_frames,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes
             |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin)
    ),

    // Columnar stub resize to 8×8: header dims rewritten, payload cut to
    // the area ratio. Fully value-oracled INCLUDING the resized payload
    // bytes: DuckDB recomputes the expected prefix from `documents` and
    // both engines fingerprint it as md5(hex(payload)) — which checks the
    // binary surgery byte-for-byte, not just the bookkeeping.
    "q_multimodal_resize" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 300))
        Multimodal.resizeStub(media, 8, 8)
          .select(col("media_id"), Multimodal.describe(col("media")).as("m"),
            // lower(): Spark hex() emits A-F, DuckDB's blob hex a-f
            md5(lower(hex(expr(s"substring(media, ${Multimodal.HeaderLen + 1}, " +
              s"length(media))")))).as("payload_md5"))
          .select(col("media_id"), col("m.width").as("width"),
            col("m.height").as("height"),
            col("m.n_frames").as("n_frames"),
            col("m.payload_bytes").as("payload_bytes"),
            col("payload_md5"))
          .orderBy("media_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    16 + (doc_id % 64) AS w, 16 + (doc_id % 48) AS h,
             |    CASE WHEN doc_id % 3 + 1 = 3 THEN 4 + (doc_id % 8) ELSE 1 END
             |      AS n_frames,
             |    encode(text) AS payload
             |  FROM documents WHERE doc_id < 300),
             |r AS (
             |  SELECT doc_id, n_frames,
             |    greatest(1, CAST(floor(
             |      octet_length(payload)::BIGINT * 64 / (w::BIGINT * h)
             |    ) AS BIGINT)) AS new_len,
             |    payload
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
             |  CAST(n_frames AS INTEGER) AS n_frames,
             |  CAST(new_len AS INTEGER) AS payload_bytes,
             |  md5(substring(lower(hex(payload)), 1, CAST(2 * new_len AS INTEGER)))
             |    AS payload_md5
             |FROM r ORDER BY media_id""".stripMargin)
    ),

    // Video frame sampling: every 2nd frame's byte range from the header
    // arithmetic alone — the narrow explode that lets a (stubbed) decoder
    // touch only sampled slices. DuckDB recomputes offsets independently
    // from `documents` (frame count and payload length are deterministic
    // functions of doc_id), value-checking the slicing math end-to-end.
    "q_multimodal_frames" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 300))
          .filter(col("modality") === "video")
        Multimodal.sampleFrames(media, everyNth = 2)
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH v AS (
             |  SELECT doc_id,
             |    4 + (doc_id % 8) AS n_frames,
             |    octet_length(encode(text)) AS payload_bytes
             |  FROM documents
             |  WHERE doc_id < 300 AND doc_id % 3 + 1 = 3)
             |SELECT doc_id AS media_id,
             |  CAST(f AS INTEGER) AS frame_idx,
             |  18 + f * (payload_bytes / CAST(greatest(n_frames, 1) AS DOUBLE))
             |    AS byte_offset,
             |  payload_bytes / CAST(greatest(n_frames, 1) AS DOUBLE)
             |    AS frame_bytes
             |FROM v, unnest(generate_series(0, n_frames - 1, 2)) AS g(f)
             |ORDER BY media_id, frame_idx""".stripMargin)
    ),

    // Frame slices through the decode boundary: every 2nd frame of each
    // video is byte-tiled (exact integer split), sliced, and decoded
    // (stub). DuckDB recomputes the tile sizes and the shape of the
    // extracted features independently; the blake3-derived VALUES stay
    // out of the projection (MultimodalSpec pins those).
    "q_multimodal_frame_features" -> QueryDef(
      (s, d) => {
        val media = Multimodal.synthesize(
          Tables.documents(s, d).filter(col("doc_id") < 150))
          .filter(col("modality") === "video")
        Multimodal.frameFeatures(media, everyNth = 2)()
          .toDF()
          .select(col("media_id"), col("frame_idx"), col("n_bytes"),
            size(col("feature")).as("feature_dim"),
            length(col("checksum")).as("checksum_len"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH v AS (
             |  SELECT doc_id,
             |    CAST(4 + (doc_id % 8) AS BIGINT) AS n_frames,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS p_len
             |  FROM documents
             |  WHERE doc_id < 150 AND doc_id % 3 + 1 = 3)
             |SELECT doc_id AS media_id,
             |  CAST(f AS INTEGER) AS frame_idx,
             |  CAST(((f + 1) * p_len) // n_frames - (f * p_len) // n_frames
             |    AS INTEGER) AS n_bytes,
             |  CAST(4 AS INTEGER) AS feature_dim,
             |  CAST(16 AS INTEGER) AS checksum_len
             |FROM v, unnest(generate_series(0, n_frames - 1, 2)) AS g(f)
             |ORDER BY media_id, frame_idx""".stripMargin)
    ),

    // Query-by-snippet audio matching: constellation fingerprints
    // (16-sample frames, 8 comb bands, peak landmarks, (peak₁,peak₂,Δ)
    // tokens) indexed for the audio modality; probes are 64-sample
    // clips (= exactly 4 frames) of every 5th track, so each probe's
    // origin track must surface at delta_w = 4 with a dominant vote
    // count. DuckDB replays frames → peaks → lead()-paired tokens →
    // the token join → offset-delta voting, end to end.
    // Relative-energy voice-activity segmentation: full 16-sample frames,
    // frame energy vs the media's own mean by cross-multiplication,
    // voiced runs merge, sub-threshold gaps split — both engines rebuild
    // energies, thresholds, and the exact segmentation.
    "q_multimodal_audio_segments" -> QueryDef(
      (s, d) => {
        val sam = Multimodal.synthesize(Tables.documents(s, d))
          .filter(col("modality") === "audio")
          .select(col("media_id"),
            decode(expr(s"substring(media, ${Multimodal.HeaderLen + 1}, " +
              "length(media))"), "UTF-8").as("s"))
        Multimodal.audioSegments(sam).orderBy("media_id", "seg_id")
      },
      Some {
        val eSum = (1 to 16).map(k =>
          s"ascii(substring(s, CAST(w.i * 16 + $k AS INTEGER), 1))")
          .mkString(" + ")
        s"""WITH sam AS (
           |  SELECT doc_id AS media_id, text AS s FROM documents
           |  WHERE doc_id % 3 = 1),
           |frames AS MATERIALIZED (
           |  SELECT media_id, CAST(length(s) // 16 AS BIGINT) AS f,
           |    w.i AS w, CAST($eSum AS BIGINT) AS e
           |  FROM sam, unnest(generate_series(0, length(s) // 16 - 1)) AS w(i)
           |  WHERE length(s) >= 16),
           |tot AS (
           |  SELECT media_id, CAST(sum(e) AS BIGINT) AS te
           |  FROM frames GROUP BY 1),
           |voiced AS (
           |  SELECT f.media_id, f.w
           |  FROM frames f JOIN tot t USING (media_id)
           |  WHERE f.e * f.f * 1000 > 1000 * t.te),
           |lagd AS (
           |  SELECT media_id, w,
           |    lag(w) OVER (PARTITION BY media_id ORDER BY w) AS prev
           |  FROM voiced),
           |sg AS (
           |  SELECT media_id, w,
           |    CAST(sum(CASE WHEN prev IS NULL OR w > prev + 1
           |                  THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY media_id ORDER BY w
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS seg_id
           |  FROM lagd)
           |SELECT media_id, seg_id,
           |  CAST(min(w) AS BIGINT) AS start_frame,
           |  CAST(max(w) AS BIGINT) AS end_frame,
           |  CAST(count(*) AS BIGINT) AS n_frames
           |FROM sg GROUP BY 1, 2
           |ORDER BY media_id, seg_id""".stripMargin
      }
    ),

    "q_multimodal_audio_match" -> QueryDef(
      (s, d) => {
        // the synthesized sample stream feeds BOTH fingerprint subplans
        // (index + probes) — scope-persist it so container synthesis and
        // payload decode run once, not once per side
        val sam = graft.util.AutoUnpersist.persistScoped(
          Multimodal.synthesize(Tables.documents(s, d))
            .filter(col("modality") === "audio")
            .select(col("media_id"),
              decode(expr(s"substring(media, ${Multimodal.HeaderLen + 1}, " +
                "length(media))"), "UTF-8").as("s")))
        val probes = sam
          .filter(col("media_id") % 5 === 0 && length(col("s")) >= 192)
          .select(col("media_id"), expr("substring(s, 65)").as("s"))
        val hits = Multimodal.audioMatch(
          Multimodal.audioFingerprints(sam),
          Multimodal.audioFingerprints(probes))
        hits.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
              .orderBy(col("votes").desc, col("media_id").asc,
                col("delta_w").asc)))
          .filter(col("rk") === 1)
          .select(col("probe_id"), col("media_id").as("track_id"),
            col("delta_w"), col("votes"))
          .orderBy("probe_id")
      },
      Some("""WITH sam AS (
             |  SELECT doc_id AS media_id, text AS s
             |  FROM documents WHERE doc_id % 3 = 1),
             |streams AS (
             |  SELECT 'T' AS side, media_id, s FROM sam
             |  UNION ALL
             |  SELECT 'P' AS side, media_id, substring(s, 65) AS s
             |  FROM sam WHERE media_id % 5 = 0 AND length(s) >= 192),
             |chars AS (
             |  SELECT side, media_id, CAST(i - 1 AS BIGINT) AS pos,
             |    ascii(substring(s, i, 1))::BIGINT AS v
             |  FROM streams,
             |    unnest(generate_series(1, CAST(length(s) AS INTEGER))) AS g(i)),
             |energy AS (
             |  SELECT side, media_id, pos // 16 AS w,
             |    CAST(pos % 8 AS INTEGER) AS b, sum(v) AS e
             |  FROM chars GROUP BY 1, 2, 3, 4),
             |peaks AS (
             |  SELECT side, media_id, w, b AS peak FROM (
             |    SELECT *, row_number() OVER (PARTITION BY side, media_id, w
             |      ORDER BY e DESC, b ASC) AS rk FROM energy)
             |  WHERE rk = 1),
             |tok AS (
             |  SELECT side, media_id, w, token FROM (
             |    SELECT side, media_id, w,
             |      unnest([peak * 32 + l1 * 4 + 1,
             |              peak * 32 + l2 * 4 + 2,
             |              peak * 32 + l3 * 4 + 3]) AS token
             |    FROM (
             |      SELECT side, media_id, w, peak,
             |        lead(peak, 1) OVER win AS l1,
             |        lead(peak, 2) OVER win AS l2,
             |        lead(peak, 3) OVER win AS l3
             |      FROM peaks
             |      WINDOW win AS (PARTITION BY side, media_id ORDER BY w)))
             |  WHERE token IS NOT NULL),
             |votes AS (
             |  SELECT p.media_id AS probe_id, t.media_id AS track_id,
             |    t.w - p.w AS delta_w, count(*)::BIGINT AS votes
             |  FROM (SELECT * FROM tok WHERE side = 'P') p
             |  JOIN (SELECT * FROM tok WHERE side = 'T') t USING (token)
             |  GROUP BY 1, 2, 3 HAVING count(*) >= 8)
             |SELECT probe_id, track_id, delta_w, votes FROM (
             |  SELECT *, row_number() OVER (PARTITION BY probe_id
             |    ORDER BY votes DESC, track_id ASC, delta_w ASC) AS rk
             |  FROM votes)
             |WHERE rk = 1 ORDER BY probe_id""".stripMargin)
    ),

    // Audio matching with stop-token pruning — the same fixture as
    // q_multimodal_audio_match, but the track index first drops HUB
    // tokens (df > 0.6% of all index entries, the published skew defense:
    // a token shared by most frames joins every probe against most of
    // the catalog while voting for no particular Δw). Matching must
    // still resolve every probe to its origin track at delta_w = 4 on
    // the surviving tokens, and n_stop_tokens rides every row so the
    // hash pins the stop-list size itself. DuckDB replays the df
    // accounting, the relative cap, and the pruned vote join end to end.
    "q_multimodal_audio_stoptok" -> QueryDef(
      (s, d) => {
        val sam = graft.util.AutoUnpersist.persistScoped(
          Multimodal.synthesize(Tables.documents(s, d))
            .filter(col("modality") === "audio")
            .select(col("media_id"),
              decode(expr(s"substring(media, ${Multimodal.HeaderLen + 1}, " +
                "length(media))"), "UTF-8").as("s")))
        val probes = sam
          .filter(col("media_id") % 5 === 0 && length(col("s")) >= 192)
          .select(col("media_id"), expr("substring(s, 65)").as("s"))
        // the track fingerprints feed BOTH the pruned index and the
        // stop-list audit — one persisted frame, two bounded aggs
        val fpsT = graft.util.AutoUnpersist.persistScoped(
          Multimodal.audioFingerprints(sam))
        val hits = Multimodal.audioMatch(
          Multimodal.dropHubTokens(fpsT, maxDfBp = 60),
          Multimodal.audioFingerprints(probes))
        val dfs = fpsT.groupBy("token").agg(count(lit(1)).as("_df"))
        val nStop = dfs.crossJoin(broadcast(dfs.agg(sum("_df").as("_tot"))))
          .agg(sum(when(col("_df") * 10000 > col("_tot") * 60, 1L)
            .otherwise(0L)).as("n_stop_tokens"))
        hits.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
              .orderBy(col("votes").desc, col("media_id").asc,
                col("delta_w").asc)))
          .filter(col("rk") === 1)
          .select(col("probe_id"), col("media_id").as("track_id"),
            col("delta_w"), col("votes"))
          .crossJoin(broadcast(nStop))
          .orderBy("probe_id")
      },
      Some("""WITH sam AS (
             |  SELECT doc_id AS media_id, text AS s
             |  FROM documents WHERE doc_id % 3 = 1),
             |streams AS (
             |  SELECT 'T' AS side, media_id, s FROM sam
             |  UNION ALL
             |  SELECT 'P' AS side, media_id, substring(s, 65) AS s
             |  FROM sam WHERE media_id % 5 = 0 AND length(s) >= 192),
             |chars AS (
             |  SELECT side, media_id, CAST(i - 1 AS BIGINT) AS pos,
             |    ascii(substring(s, i, 1))::BIGINT AS v
             |  FROM streams,
             |    unnest(generate_series(1, CAST(length(s) AS INTEGER))) AS g(i)),
             |energy AS (
             |  SELECT side, media_id, pos // 16 AS w,
             |    CAST(pos % 8 AS INTEGER) AS b, sum(v) AS e
             |  FROM chars GROUP BY 1, 2, 3, 4),
             |peaks AS (
             |  SELECT side, media_id, w, b AS peak FROM (
             |    SELECT *, row_number() OVER (PARTITION BY side, media_id, w
             |      ORDER BY e DESC, b ASC) AS rk FROM energy)
             |  WHERE rk = 1),
             |tok AS (
             |  SELECT side, media_id, w, token FROM (
             |    SELECT side, media_id, w,
             |      unnest([peak * 32 + l1 * 4 + 1,
             |              peak * 32 + l2 * 4 + 2,
             |              peak * 32 + l3 * 4 + 3]) AS token
             |    FROM (
             |      SELECT side, media_id, w, peak,
             |        lead(peak, 1) OVER win AS l1,
             |        lead(peak, 2) OVER win AS l2,
             |        lead(peak, 3) OVER win AS l3
             |      FROM peaks
             |      WINDOW win AS (PARTITION BY side, media_id ORDER BY w)))
             |  WHERE token IS NOT NULL),
             |tdf AS (
             |  SELECT token, count(*)::BIGINT AS df
             |  FROM tok WHERE side = 'T' GROUP BY token),
             |ttot AS (SELECT sum(df)::BIGINT AS tot FROM tdf),
             |keep AS (
             |  SELECT token FROM tdf, ttot WHERE df * 10000 <= tot * 60),
             |nstop AS (
             |  SELECT CAST(count(*) - (SELECT count(*) FROM keep) AS BIGINT)
             |    AS n_stop_tokens FROM tdf),
             |votes AS (
             |  SELECT p.media_id AS probe_id, t.media_id AS track_id,
             |    t.w - p.w AS delta_w, count(*)::BIGINT AS votes
             |  FROM (SELECT * FROM tok WHERE side = 'P') p
             |  JOIN (SELECT tok.* FROM tok JOIN keep USING (token)
             |        WHERE side = 'T') t USING (token)
             |  GROUP BY 1, 2, 3 HAVING count(*) >= 8)
             |SELECT probe_id, track_id, delta_w, votes, n_stop_tokens
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY probe_id
             |    ORDER BY votes DESC, track_id ASC, delta_w ASC) AS rk
             |  FROM votes) v, nstop
             |WHERE rk = 1 ORDER BY probe_id""".stripMargin)
    ),

    // CLIP-style image–text alignment filtering (the LAION slot): every
    // doc becomes an (image payload, caption) pair, captions of doc_id%7
    // docs are SWAPPED with their neighbor's, and the Pearson-correlation
    // alignment score over 16-segment byte-mean profiles must separate
    // them. The swapped flag rides along in the output, so the result
    // carries its own confusion table. DuckDB replays profile, score,
    // and threshold end-to-end.
    "q_multimodal_align" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val media = Multimodal.synthesize(docs)
        val capSrc = docs.select(col("doc_id").as("cap_of"),
          col("text").as("cap_text"))
        val caps = docs
          .select(col("doc_id"), col("text"),
            when(pmod(col("doc_id"), lit(7)) === 0, col("doc_id") + 1)
              .otherwise(col("doc_id")).as("cap_id"))
          .join(capSrc, col("cap_id") === col("cap_of"), "left")
          .select(col("doc_id").as("media_id"),
            coalesce(col("cap_text"), col("text")).as("caption"),
            (pmod(col("doc_id"), lit(7)) === 0 && col("cap_of").isNotNull)
              .as("swapped"))
        Multimodal.alignmentScore(
            media.join(caps, "media_id"), d = 16)
          .join(caps.select("media_id", "swapped"), "media_id")
          .select("media_id", "align_bp", "matched", "swapped")
          .orderBy("media_id")
      },
      Some(alignSql)
    )
  )

  /** DuckDB replay of [[Multimodal.alignmentScore]] at d=16 over the
    * swapped-caption fixture: byte-mean segment profiles for both sides,
    * then the Pearson correlation as the IDENTICAL fixed-order
    * expression tree (sums and products left-associated exactly as the
    * Spark column expressions are built — grouped float sums would be
    * partition-order-dependent, column chains are not).
    */
  private def alignSql: String = {
    val D = 16
    def cells(side: String) = (0 until D).flatMap(k => Seq(
      s"CAST(sum(CASE WHEN side = '$side' AND seg = $k THEN ssum ELSE 0 END) AS BIGINT) AS ${side}_ssum_$k",
      s"CAST(sum(CASE WHEN side = '$side' AND seg = $k THEN slen ELSE 0 END) AS BIGINT) AS ${side}_slen_$k"))
    def mean(side: String, k: Int) =
      s"(${side}_ssum_$k::DOUBLE / ${side}_slen_$k)"
    def chain(terms: Seq[String]) = terms.reduceLeft((a, b) => s"($a + $b)")
    val sa = chain((0 until D).map(mean("img", _)))
    val sb = chain((0 until D).map(mean("txt", _)))
    val sab = chain((0 until D).map(k => s"(${mean("img", k)} * ${mean("txt", k)})"))
    val saa = chain((0 until D).map(k => s"(${mean("img", k)} * ${mean("img", k)})"))
    val sbb = chain((0 until D).map(k => s"(${mean("txt", k)} * ${mean("txt", k)})"))
    s"""WITH pay AS (
       |  SELECT doc_id AS media_id, text AS s
       |  FROM documents WHERE doc_id < 300),
       |caps AS (
       |  SELECT d.doc_id AS media_id, coalesce(c.text, d.text) AS cap,
       |    (d.doc_id % 7 = 0 AND c.doc_id IS NOT NULL) AS swapped
       |  FROM (SELECT doc_id, text,
       |      CASE WHEN doc_id % 7 = 0 THEN doc_id + 1 ELSE doc_id END AS cap_id
       |    FROM documents WHERE doc_id < 300) d
       |  LEFT JOIN (SELECT doc_id, text FROM documents WHERE doc_id < 300) c
       |    ON c.doc_id = d.cap_id),
       |sides AS (
       |  SELECT media_id, 'img' AS side, s FROM pay
       |  UNION ALL
       |  SELECT media_id, 'txt' AS side, cap AS s FROM caps),
       |chars AS (
       |  SELECT media_id, side, length(s)::BIGINT AS n, i - 1 AS pos,
       |    ascii(substring(s, i, 1))::BIGINT AS v
       |  FROM sides, unnest(generate_series(1, CAST(length(s) AS INTEGER))) AS g(i)
       |  WHERE length(s) >= $D),
       |segd AS (
       |  SELECT media_id, side, (pos * $D) // n AS seg,
       |    CAST(sum(v) AS BIGINT) AS ssum, count(*)::BIGINT AS slen
       |  FROM chars GROUP BY 1, 2, 3),
       |wide AS (
       |  SELECT media_id,
       |    ${(cells("img") ++ cells("txt")).mkString(",\n    ")}
       |  FROM segd GROUP BY 1),
       |sc AS (
       |  SELECT media_id,
       |    CAST(floor((CASE WHEN (($D.0 * $saa) - ($sa * $sa)) > 0.0
       |        AND (($D.0 * $sbb) - ($sb * $sb)) > 0.0
       |      THEN (($D.0 * $sab) - ($sa * $sb))
       |        / (sqrt(($D.0 * $saa) - ($sa * $sa))
       |          * sqrt(($D.0 * $sbb) - ($sb * $sb)))
       |      ELSE 0.0 END) * 10000.0) AS BIGINT) AS align_bp
       |  FROM wide)
       |SELECT sc.media_id, align_bp, (align_bp >= 9000) AS matched, swapped
       |FROM sc JOIN caps ON caps.media_id = sc.media_id
       |ORDER BY sc.media_id""".stripMargin
  }
}
