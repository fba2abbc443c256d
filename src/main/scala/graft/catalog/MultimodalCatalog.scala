package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.core.Event
import graft.core.parse.GameLogParser
import graft.core.stats.PlayerStatsEngine
import graft.core.enrich.Enrich
import graft.analytics.{AsofJoin, GlobalCumsum, Intervals, RangeJoin, Scoreboard, Sessionize}
import graft.ext.{Dedup, Diff, Multimodal, Prefilter, Sampling, Similarity, Skew, TextAnalysis}

import CatalogShared._

/** Multimodal: typed binary metadata, real JDK PNG decode/resize,
  * perceptual-hash image dedup, WAV decode + framing, frame sampling.
  *
  * Each entry is (name, query, oracle SQL) exactly as it sat in
  * SparkEntry's catalog before the per-family split; SparkEntry composes
  * the families back into the single driver-contract map.
  */
private[graft] object MultimodalCatalog {

  val entries: Seq[(String, Q, Option[String])] = Seq(


    ("q32_multimodal_meta", (s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id") +: Multimodal.metadataColumns("text"): _*)
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        hex(encode(substr(text, 1, 4))) AS head_hex,
        CAST(ascii(text) AS BIGINT) AS first_byte
      FROM documents ORDER BY doc_id""")),


    // Multimodal frame sampling through the typed media pipeline: documents
    // wrap as binary payloads (Multimodal.asMediaTable), the partition-
    // batched 1→3 frame sampler slices each payload deterministically
    // (stub codec — real extractor swaps in with the same signature), and
    // the output projects only derived columns (length, head bytes) so the
    // payload never shuffles. Oracle: the same byte-range arithmetic over
    // the (all-ASCII) text in DuckDB.
    ("q131_frame_sample", (s, dir) => {
      val media = Multimodal.asMediaTable(
        T(s, dir, "documents"), "doc_id", "text", "text/plain")
      Multimodal.sampleFrames(media, 3)
        .select(col("id").as("doc_id"), col("frameIndex").as("frame_index"),
          expr("CAST(octet_length(payload) AS BIGINT)").as("frame_bytes"),
          hex(expr("substr(payload, 1, 4)")).as("frame_head_hex"))
        .orderBy(col("doc_id"), col("frame_index"))
    }, Some("""
      WITH m AS (SELECT doc_id, text, length(text) AS len FROM documents),
      f AS (SELECT doc_id, text, CAST(k AS INT) AS k,
              (len*k)//3 AS s, (len*(k+1))//3 AS e
            FROM m CROSS JOIN (SELECT unnest(range(0, 3)) AS k) r)
      SELECT doc_id, k AS frame_index, CAST(e - s AS BIGINT) AS frame_bytes,
        hex(encode(substring(text, CAST(s+1 AS INT),
          CAST(least(4, e-s) AS INT)))) AS frame_head_hex
      FROM f ORDER BY doc_id, frame_index""")),


    // REAL image decode (javax.imageio, no stub): per doc a deterministic
    // grayscale PNG is synthesized (w = 4 + id%5, h = 3 + id%4, pixel
    // (x,y) = (id·31 + x·7 + y·13) mod 256 — Multimodal.synthPixel), every
    // 50th payload is CORRUPTED to exercise the skip-and-flag path (one
    // bad blob must never kill a 100 TB scan), and ImageIO decodes the
    // rest back. PNG is lossless, so the decoded width/height/band-count/
    // pixel-sum must equal the oracle's pure-arithmetic recomputation of
    // the generation formula — a real codec round trip, hash-gated.
    // Scale shape: synthesis and decode are partition-batched maps; only
    // small feature rows survive past the decode (payloads never shuffle).
    ("q214_image_decode", (s, dir) => {
      import s.implicits._
      val specs = T(s, dir, "documents").select(
        col("doc_id").as("id"),
        (lit(4) + col("doc_id") % 5).cast("int").as("w"),
        (lit(3) + col("doc_id") % 4).cast("int").as("h"))
      val media = Multimodal.synthesizePngs(specs)
        .withColumn("payload",
          when(col("id") % 50 === 0, lit("notanimage".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Multimodal.decodeImages(media)
        .toDF()
        .select(col("id").as("doc_id"), col("decodeOk").as("decode_ok"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("nBands").cast("long").as("n_bands"), col("pxSum").as("px_sum"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH d AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
               doc_id % 50 = 0 AS corrupt
        FROM documents),
      px AS (
        SELECT d.doc_id, CAST(sum((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS BIGINT) AS s
        FROM d
        CROSS JOIN (SELECT unnest(range(0, 8)) AS x) x
        CROSS JOIN (SELECT unnest(range(0, 6)) AS y) y
        WHERE x.x < d.w AND y.y < d.h
        GROUP BY d.doc_id)
      SELECT d.doc_id,
        NOT d.corrupt AS decode_ok,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE d.w END AS BIGINT) AS width,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE d.h END AS BIGINT) AS height,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE 1 END AS BIGINT) AS n_bands,
        CASE WHEN d.corrupt THEN 0 ELSE px.s END AS px_sum
      FROM d JOIN px ON px.doc_id = d.doc_id
      ORDER BY d.doc_id""")),


    // REAL image resize (decode → nearest-neighbor resample → PNG
    // re-encode → decode again): every synthetic PNG (q214's formula,
    // varying source geometry) is resized to a FIXED 4×3 — the
    // resize-to-model-input step every vision pipeline runs — and the
    // RE-DECODED pixels must equal the oracle's pure arithmetic
    // (sx = x·w div 4, sy = y·h div 3; two lossless PNG round trips, so
    // the whole chain is exact). Payloads shrink to the target geometry
    // and never shuffle; only feature rows leave the partition.
    ("q216_image_resize", (s, dir) => {
      val specs = T(s, dir, "documents").select(
        col("doc_id").as("id"),
        (lit(4) + col("doc_id") % 5).cast("int").as("w"),
        (lit(3) + col("doc_id") % 4).cast("int").as("h"))
      val resized = Multimodal.resizeImages(
          Multimodal.synthesizePngs(specs).toDF(), dw = 4, dh = 3)
        .toDF()
        .select(col("id"), col("payload"), col("mimeType"))
      Multimodal.decodeImages(resized)
        .toDF()
        .select(col("id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("pxSum").as("px_sum"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH d AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        FROM documents),
      px AS (
        SELECT d.doc_id,
          CAST(sum((d.doc_id * 31 + ((x.x * d.w) // 4) * 7
                    + ((y.y * d.h) // 3) * 13) % 256) AS BIGINT) AS s
        FROM d
        CROSS JOIN (SELECT unnest(range(0, 4)) AS x) x
        CROSS JOIN (SELECT unnest(range(0, 3)) AS y) y
        GROUP BY d.doc_id)
      SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
             px.s AS px_sum
      FROM d JOIN px USING (doc_id)
      ORDER BY doc_id""")),


    // REAL perceptual-hash image dedup — the image twin of the simhash
    // text pipeline, every stage real and oracle-replayed: deterministic
    // PNG variants (pairs share a pixel source; odd ids carry a one-grey-
    // level tweak at (0,0); every 50th payload corrupted) → javax.imageio
    // decode → exact-integer 8×8 average-hash (two 32-bit halves — the
    // oracle engine cannot shift into bit 63) → 4×16-bit band buckets →
    // exact hamming verify ≤ 3. The banded join is RESULT-IDENTICAL to
    // brute force at this threshold (pigeonhole: ≤3 differing bits leave
    // ≥1 of 4 bands equal), so the oracle replays brute force; corrupt
    // payloads hash as hashOk=false and must match NOTHING.
    ("q240_image_ahash_dedup", (s, dir) => {
      val specs = T(s, dir, "documents").where(col("doc_id") < 200).select(
        col("doc_id").as("id"),
        expr("doc_id div 2").as("pxId"),
        (lit(8) + expr("doc_id div 2") % 5).cast("int").as("w"),
        (lit(8) + expr("doc_id div 2") % 4).cast("int").as("h"),
        (col("doc_id") % 2 === 1).as("tweak"))
      val media = Multimodal.synthesizePngVariants(specs).toDF()
        .withColumn("payload",
          when(col("id") % 50 === 0, lit("notanimage".getBytes("UTF-8")))
            .otherwise(col("payload")))
      val hashes = Multimodal.averageHashes(media).toDF()
      Dedup.imageDupPairs(hashes, "id", "hashHi", "hashLo", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      WITH d AS (
        SELECT doc_id AS id, doc_id // 2 AS px_id, doc_id % 2 = 1 AS tweak
        FROM documents WHERE doc_id < 200 AND doc_id % 50 <> 0),
      geo AS (
        SELECT id, px_id, tweak, 8 + px_id % 5 AS w, 8 + px_id % 4 AS h
        FROM d),
      px AS (
        SELECT g.id, g.w, g.h, x.x AS x, y.y AS y,
          (((g.px_id * 31 + x.x * 7 + y.y * 13) % 256) +
           CASE WHEN g.tweak AND x.x = 0 AND y.y = 0 THEN 1 ELSE 0 END) % 256 AS p
        FROM geo g
        CROSS JOIN (SELECT unnest(range(0, 13)) AS x) x
        CROSS JOIN (SELECT unnest(range(0, 12)) AS y) y
        WHERE x.x < g.w AND y.y < g.h),
      cells AS (
        SELECT id, (y * 8) // h AS gy, (x * 8) // w AS gx,
          sum(p)::BIGINT AS cs, count(*)::BIGINT AS cp
        FROM px GROUP BY 1, 2, 3),
      tot AS (
        SELECT id, sum(cs)::BIGINT AS ts, sum(cp)::BIGINT AS tp
        FROM cells GROUP BY 1),
      grid AS (
        SELECT a.gy, b.gx
        FROM (SELECT unnest(range(0, 8)) AS gy) a,
             (SELECT unnest(range(0, 8)) AS gx) b),
      bits AS (
        SELECT t.id, g.gy * 8 + g.gx AS k,
          CASE WHEN COALESCE(c.cs, 0) * t.tp > t.ts * COALESCE(c.cp, 0)
               THEN 1 ELSE 0 END AS bit
        FROM tot t CROSS JOIN grid g
        LEFT JOIN cells c ON c.id = t.id AND c.gy = g.gy AND c.gx = g.gx),
      hashes AS (
        SELECT id,
          sum(CASE WHEN k < 32 THEN bit::BIGINT << (31 - k) ELSE 0 END)::BIGINT AS hi,
          sum(CASE WHEN k >= 32 THEN bit::BIGINT << (63 - k) ELSE 0 END)::BIGINT AS lo
        FROM bits GROUP BY 1)
      SELECT a.id AS id_a, b.id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM hashes a JOIN hashes b ON a.id < b.id
      WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
      ORDER BY id_a, id_b""")),


    // REAL audio decode — the JDK's own codec (javax.sound.sampled, the
    // audio twin of javax.imageio; q214's discipline): deterministic
    // 16-bit PCM mono WAVs (sample formula s = ((id·31+i·7) mod 65536) −
    // 32768, lossless container ⇒ exact round trip), every 50th payload
    // corrupted and flagging decodeOk=false instead of killing the scan.
    // Features are exact integers (n_samples, peak |s|, Σ|s|) the oracle
    // recomputes arithmetically. Compressed formats (mp3/ogg) stay a
    // documented deployment boundary — the container family is real.
    ("q241_audio_decode", (s, dir) => {
      val specs = T(s, dir, "documents").select(
        col("doc_id").as("id"),
        (lit(256) + col("doc_id") % 100).cast("int").as("nSamples"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("sampleRate"))
      val media = Multimodal.synthesizeWavs(specs).toDF()
        .withColumn("payload",
          when(col("id") % 50 === 0, lit("notaudio".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Multimodal.decodeWavs(media).toDF()
        .select(col("id").as("doc_id"), col("decodeOk").as("decode_ok"),
          col("sampleRate").cast("long").as("sample_rate"),
          col("nChannels").cast("long").as("n_channels"),
          col("nSamples").as("n_samples"),
          col("peakAbs").as("peak_abs"), col("sumAbs").as("sum_abs"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH d AS (
        SELECT doc_id, 256 + doc_id % 100 AS n,
               8000 + (doc_id % 3) * 4000 AS rate,
               doc_id % 50 = 0 AS corrupt
        FROM documents),
      sm AS (
        SELECT d.doc_id,
          CAST(max(abs((d.doc_id * 31 + i.i * 7) % 65536 - 32768)) AS BIGINT) AS peak,
          CAST(sum(abs((d.doc_id * 31 + i.i * 7) % 65536 - 32768)) AS BIGINT) AS sa
        FROM d CROSS JOIN (SELECT unnest(range(0, 356)) AS i) i
        WHERE i.i < d.n
        GROUP BY d.doc_id)
      SELECT d.doc_id, NOT d.corrupt AS decode_ok,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE d.rate END AS BIGINT) AS sample_rate,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE 1 END AS BIGINT) AS n_channels,
        CAST(CASE WHEN d.corrupt THEN 0 ELSE d.n END AS BIGINT) AS n_samples,
        CASE WHEN d.corrupt THEN 0 ELSE sm.peak END AS peak_abs,
        CASE WHEN d.corrupt THEN 0 ELSE sm.sa END AS sum_abs
      FROM d JOIN sm ON sm.doc_id = d.doc_id
      ORDER BY d.doc_id""")),


    // REAL audio framing — fixed 128-sample analysis frames with exact
    // integer energy (Σ|s| per frame): the VAD/segmentation primitive,
    // 1→n rows per payload through the typed flatMap (the real shape of a
    // frame extractor); the ragged final frame keeps its true sample
    // count, corrupt payloads emit nothing.
    ("q242_audio_frames", (s, dir) => {
      val specs = T(s, dir, "documents").where(col("doc_id") < 100).select(
        col("doc_id").as("id"),
        (lit(256) + col("doc_id") % 100).cast("int").as("nSamples"),
        lit(16000).as("sampleRate"))
      val media = Multimodal.synthesizeWavs(specs).toDF()
        .withColumn("payload",
          when(col("id") % 50 === 0, lit("notaudio".getBytes("UTF-8")))
            .otherwise(col("payload")))
      Multimodal.frameEnergies(media, frameSamples = 128).toDF()
        .select(col("id").as("doc_id"), col("frameIndex").as("frame_index"),
          col("nSamples").as("n_samples"), col("sumAbs").as("sum_abs"))
        .orderBy(col("doc_id"), col("frame_index"))
    }, Some("""
      WITH d AS (
        SELECT doc_id, 256 + doc_id % 100 AS n
        FROM documents WHERE doc_id < 100 AND doc_id % 50 <> 0),
      sm AS (
        SELECT d.doc_id, i.i // 128 AS frame_index,
          count(*)::BIGINT AS n_samples,
          CAST(sum(abs((d.doc_id * 31 + i.i * 7) % 65536 - 32768)) AS BIGINT) AS sum_abs
        FROM d CROSS JOIN (SELECT unnest(range(0, 356)) AS i) i
        WHERE i.i < d.n
        GROUP BY 1, 2)
      SELECT doc_id, CAST(frame_index AS BIGINT) AS frame_index, n_samples, sum_abs
      FROM sm ORDER BY doc_id, frame_index"""))
  )
}
