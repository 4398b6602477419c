package graft.multimodal

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque `binary` columns with
  * typed metadata, plus the decode → feature-extract plumbing a
  * 100 TB media pipeline needs (builder brief).
  *
  * The container has no image/audio codecs, so the *decode step is a
  * STUB* — a deterministic fake that derives pseudo-pixels from the
  * payload bytes. Everything around it is real and tested: the
  * schema (binary + metadata struct), the partition-preserving
  * batched `mapPartitions` shape (the Scala analog of
  * `mapInPandas` — records stream through an iterator, never
  * materializing a partition), and the downstream feature queries.
  *
  * Payloads here are synthesized from `documents.text` bytes so the
  * pipeline runs against driver testdata; a real deployment swaps
  * the source for `spark.read.format("binaryFile")` and the stub for
  * a codec call with the identical record/batch shape.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_intensity: Double,
      checksum: Long)

  /** documents → media records: payload = utf-8 bytes; fake metadata
    * derived deterministically from doc stats. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("fake/raw").as("format"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 12).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic pseudo-decode of payload bytes —
    * stands in for a real codec (`???` boundary). Keeps the exact
    * signature a real decoder would have: bytes → pixel intensities. */
  private def decodeStub(payload: Array[Byte]): Array[Double] =
    payload.map(b => (b & 0xFF).toDouble)

  /** Frame sampling stub: every `stride`-th byte-window as a "frame". */
  private def sampleFrames(pixels: Array[Double], stride: Int): Int =
    math.max(1, pixels.length / stride)

  /** Batched decode + feature extraction via mapPartitions: one
    * decoder init per partition (the expensive part with a real
    * codec), streaming record-at-a-time through the iterator. The
    * checksum is the same wrapping 31-polynomial byte fold as
    * [[graft.functions.RollingHash]], so the DuckDB oracle can replay
    * every output column (fully oracle-checked despite the stubbed
    * codec); the mean intensity is emitted RAW and rounded at the
    * query boundary like every other float output. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: initialize codec/context once per partition here
      it.map { rec =>
        val pixels = decodeStub(rec.payload)
        var h = 0L
        var i = 0
        while (i < rec.payload.length) { h = h * 31 + (rec.payload(i) & 0xFF); i += 1 }
        MediaFeatures(
          doc_id = rec.doc_id,
          n_bytes = rec.payload.length,
          width = rec.width,
          height = rec.height,
          n_frames = sampleFrames(pixels, 32),
          mean_intensity = if (pixels.isEmpty) 0.0 else pixels.sum / pixels.length,
          checksum = h)
      }
    }
  }

  // ---------------------------------------------------------------- queries
  /** Metadata projection over the binary column — oracle-checkable
    * (byte length + md5 digest agree across engines). */
  val mediaMeta: Q = Q("mm_media_meta",
    """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS digest, 'fake/raw' AS format
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    mediaTable(s, dir).toDF()
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"), col("format"))
      .orderBy(col("doc_id"))
  }

  /** Decode-stub feature extraction — FULLY oracle-checked: the
    * corpus is ASCII so DuckDB replays the byte decode per character
    * (`ord`), the polynomial checksum with a HUGEINT accumulator mod
    * 2⁶⁴ (same formula as `text_fingerprint64`'s oracle), the mean
    * intensity as a sequential list average, and the frame count as
    * integer division. Determinism + batch shape additionally
    * asserted in ScalaTest. */
  val mediaFeatures: Q = Q("mm_media_features",
    """WITH f AS (
      |  SELECT doc_id, n_chars,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes,
      |    CASE WHEN length(text) = 0 THEN 0::HUGEINT ELSE list_reduce(
      |      list_transform(range(1, length(text) + 1),
      |                     i -> CAST(ord(substr(text, i, 1)) AS HUGEINT)),
      |      (acc, x) -> (acc * 31 + x) % 18446744073709551616::HUGEINT) END AS h,
      |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |      list_avg(list_transform(range(1, length(text) + 1),
      |                              i -> CAST(ord(substr(text, i, 1)) AS DOUBLE)))
      |    END AS mi
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  CAST(n_chars % 64 + 16 AS INTEGER) AS width,
      |  CAST(n_chars % 48 + 12 AS INTEGER) AS height,
      |  CAST(GREATEST(1, n_bytes // 32) AS INTEGER) AS n_frames,
      |  ROUND(mi, 6) AS mean_intensity,
      |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
      |            THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS checksum
      |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    extractFeatures(mediaTable(s, dir)).toDF()
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width"), col("height"), col("n_frames"),
        round(col("mean_intensity"), 6).as("mean_intensity"),
        col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over the payload: fixed-stride 64-byte windows
    * exploded to one row per frame with per-frame digests — the
    * video-frame / audio-chunk extraction shape (the real decoder
    * swaps in at the same record boundary). Corpus is ASCII so the
    * char windows are byte windows; oracle checks count, size and
    * digest per frame. */
  val frameSample: Q = Q("mm_frame_sample",
    """SELECT doc_id, i AS frame_idx,
      |  length(substring(text, i*64 + 1, 64)) AS frame_bytes,
      |  md5(substring(text, i*64 + 1, 64)) AS frame_digest
      |FROM documents, generate_series(0, 9) g(i)
      |WHERE i*64 < n_chars
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        posexplode(expr("transform(sequence(0, 9), i -> substring(text, i*64 + 1, 64))"))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") * 64 < col("n_chars"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val all: Seq[Q] = Seq(mediaMeta, mediaFeatures, frameSample)
}
