package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payload columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schemas, partition-preserving
  * per-batch processing, deterministic outputs. The IMAGE codec is real
  * ([[ImageCodec]], pure-JVM `javax.imageio` PNG/JPEG decode + resize),
  * and so is the container metadata of every modality: WAV
  * ([[AudioCodec]], `javax.sound.sampled` header parse), MP3
  * ([[Mp3Codec]], MPEG-1 Layer III frame walk), and MP4 ([[Mp4Codec]],
  * ISO BMFF `mvhd`/`tkhd` box walk). Only pixel-level VIDEO FRAME
  * decode remains a STUB (`StubCodec`) — that codec genuinely doesn't
  * exist in this environment. At deployment the
  * stub body is the only thing that changes: the operator shape
  * (mapPartitions over
  * binary payloads, bounded batches, metadata struct out) is what has to
  * survive 100 TB, where payload columns dominate I/O — hence:
  *  - metadata extraction never shuffles (row-local mapPartitions);
  *  - payloads are droppable early (`select` the metadata struct only →
  *    Parquet column pruning skips the blob pages entirely);
  *  - frame sampling emits rows, not wider blobs, so downstream
  *    operators see bounded row sizes.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** One sampled frame (video/audio window) of a payload. */
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long,
      feature: Double)

  /** STUB decode: deterministic pseudo-metadata derived from the payload
    * bytes. Replace with a real codec (e.g. javax.imageio / ffmpeg JNI)
    * in deployment — signature and determinism contract stay. */
  object StubCodec {
    def decode(id: Long, kind: String, bytes: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map(b => f"$b%02x").mkString
      val sum = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      MediaMeta(id, kind, bytes.length.toLong, hex,
        width = (sum % 1920).toInt + 1,
        height = ((sum / 1920) % 1080).toInt + 1,
        duration_ms = bytes.length.toLong * 7)
    }

    /** Deterministic per-frame feature (stands in for a decoded frame
      * embedding/pixel statistic). */
    def frameFeature(bytes: Array[Byte], idx: Int): Double =
      if (bytes.isEmpty) 0.0
      else bytes(idx % bytes.length).toDouble / 128.0
  }

  /** Decode metadata for a frame of (media_id, kind, payload) rows.
    * Image, WAV, MP3, and MP4 payloads (sniffed by magic bytes, not
    * trusted from `kind`) get a REAL decode — `javax.imageio` for
    * PNG/JPEG (kind becomes the container format, width/height from
    * the parsed header), `javax.sound.sampled` for WAV and an MPEG
    * frame walk for MP3 (kinds `audio/wav`/`audio/mpeg`, duration_ms
    * from the parsed headers, width/height 0 — audio has none), and an
    * ISO BMFF box walk for MP4 (kind `video/mp4`, width/height from
    * `tkhd`, duration from `mvhd`); everything else falls back to
    * [[StubCodec]]. Row-local; partitioning preserved. */
  def extractMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def checksum(bytes: Array[Byte]): String = {
          md.reset()
          md.digest(bytes).map(b => f"$b%02x").mkString
        }
        it.map { case (id, kind, bytes) =>
          ImageCodec.decode(bytes) match {
            case Some((fmt, w, h)) =>
              MediaMeta(id, fmt, bytes.length.toLong, checksum(bytes), w, h,
                duration_ms = 0L)
            case None => AudioCodec.decode(bytes) match {
              case Some((_, _, durMs)) =>
                MediaMeta(id, "audio/wav", bytes.length.toLong,
                  checksum(bytes), width = 0, height = 0,
                  duration_ms = durMs)
              case None => Mp3Codec.decode(bytes) match {
                case Some((_, _, durMs)) =>
                  MediaMeta(id, "audio/mpeg", bytes.length.toLong,
                    checksum(bytes), width = 0, height = 0,
                    duration_ms = durMs)
                case None => Mp4Codec.decode(bytes) match {
                  case Some((w, h, durMs)) =>
                    MediaMeta(id, "video/mp4", bytes.length.toLong,
                      checksum(bytes), w, h, duration_ms = durMs)
                  case None => StubCodec.decode(id, kind, bytes)
                }
              }
            }
          }
        }
      }
      .toDF()
  }

  /** Parsed duration of a payload via whichever real codec sniffs it
    * (WAV, MP3, MP4, uncompressed AVI) — None when none does. */
  private def parsedDurationMs(bytes: Array[Byte]): Option[Long] =
    AudioCodec.decode(bytes).map(_._3)
      .orElse(Mp3Codec.decode(bytes).map(_._3))
      .orElse(Mp4Codec.decode(bytes).map(_._3))
      .orElse(AviCodec.decodeMeta(bytes).map {
        case (_, _, nf, usPf) => nf.toLong * usPf / 1000
      })

  /** Sample up to `maxFrames` frames per payload at a fixed stride —
    * the video/audio-window path of a multimodal pipeline. Emits
    * narrow rows. WAV/MP3/MP4 payloads (magic-sniffed) use their REAL
    * parsed duration to size the frame count; everything else falls
    * back to the stub's byte-derived duration. */
  def sampleFrames(media: DataFrame, strideMs: Long, maxFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, _, bytes) =>
        val durationMs = parsedDurationMs(bytes)
          .getOrElse(bytes.length.toLong * 7)
        val n = math.min(maxFrames,
          math.max(1, (durationMs / math.max(strideMs, 1)).toInt))
        (0 until n).iterator.map { i =>
          Frame(id, i, i * strideMs, StubCodec.frameFeature(bytes, i))
        }
      })
      .toDF()
  }

  /** REAL image feature extraction: decode each payload once and emit
    * per-channel pixel sums (+ dims) — rows whose payload isn't a
    * decodable image are dropped. Row-local flatMap over partitions,
    * payload never shuffled; downstream means/histograms are plain
    * column arithmetic on the sums. */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decodeImage(bytes).map { case (_, img) =>
          val (r, g, b) = ImageCodec.channelSums(img)
          (id, img.getWidth, img.getHeight, r, g, b)
        }
      })
      .toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum")
  }

  /** Fixed-dimension feature vector per payload — the multimodal →
    * embedding bridge (decoded-frame embeddings in deployment; the stub
    * derives each component from payload bytes deterministically, so
    * the DuckDB oracle recomputes it). Output feeds [[Similarity]]
    * directly. Row-local, payload dropped on output. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fs = Array.tabulate(dim) { i =>
          if (bytes.isEmpty) 0.0
          else (bytes((i * 7) % bytes.length) & 0xFF) / 128.0
        }
        (id, fs)
      })
      .toDF("media_id", "features")
  }

  /** Payload → payload resize stage (image/video rescale in deployment;
    * the stub truncates to the target pixel budget). The shape is what
    * matters at scale: blob-in/blob-out stays inside one task, no
    * shuffle, and emits refreshed metadata columns so downstream stages
    * never re-decode. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one digest per partition, reset per row (provider lookup is
        // not per-row-cheap — same pattern as MinHashImpl.digests)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, kind, bytes) =>
          // Image payloads: real decode → aspect-fit scale → re-encode
          // PNG → re-decode, so the reported dims are read back from the
          // emitted bytes (round-trip proof), not echoed targets.
          val roundTrip = ImageCodec.resize(bytes, targetW, targetH)
            .flatMap(out => ImageCodec.decode(out).map(out -> _))
          roundTrip match {
            case Some((out, (fmt, w, h))) =>
              md.reset()
              val hex = md.digest(out).map(b => f"$b%02x").mkString
              (id, fmt, out, w, h, out.length.toLong, hex)
            case None =>
              val budget = math.max(1, targetW * targetH / 100)
              val out = bytes.take(budget)
              md.reset()
              val hex = md.digest(out).map(b => f"$b%02x").mkString
              (id, kind, out, targetW, targetH, out.length.toLong, hex)
          }
        }
      }
      .toDF("media_id", "kind", "payload", "width", "height",
        "n_bytes", "checksum")
  }

  /** A synthetic media frame derived from `documents` (text bytes as the
    * opaque payload) — deterministic input for tests and oracles. All
    * payloads here are text bytes (the stub-codec path); for real
    * PNG/JPEG payloads use [[syntheticImages]] / [[mixedMedia]]. */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.select(
      col("doc_id").as("media_id"),
      when(expr("doc_id % 3 = 0"), "image")
        .when(expr("doc_id % 3 = 1"), "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  /** Real PNG/JPEG payloads for the image rows (doc_id % 3 = 0): bytes
    * are encoded on executors with dimensions [[ImageCodec.syntheticDims]]
    * derives from the id, so the DuckDB oracle can predict what a REAL
    * decode must recover without being able to parse the bytes itself.
    * Payload generation is row-local mapPartitions — at scale this row
    * stands in for a parquet/tar scan of blob columns. */
  def syntheticImages(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 3 = 0"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id => (id, "image", ImageCodec.encodeSynthetic(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Near-duplicate image family: the image-id rows re-rendered so
    * consecutive image ids (gid = id/9 groups the %3=0 ids in threes)
    * share a gid-keyed base pattern with a small variant edit confined
    * to the top pixel rows — REAL PNGs whose dHash distances the
    * DuckDB oracle predicts from [[ImageCodec.variantLum]], making the
    * whole decode → perceptual-hash → banded-pair pipeline
    * oracle-checkable. */
  def syntheticVariantImages(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 3 = 0"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "image", ImageCodec.encodeSyntheticVariant(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Perceptual hash per image payload: real decode → 64-bit dHash
    * ([[ImageCodec.dHash64]]). Row-local mapPartitions — the payload
    * never survives the projection, so only (id, 8-byte hash) rows
    * reach any downstream shuffle; non-image payloads drop out (the
    * degrade-to-None contract of the other decoders). Feed the result
    * to [[Dedup.fingerprintNearDupPairs]] for image near-dup pairs. */
  def imagePhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decodeImage(bytes).map { case (_, img) =>
          (id, ImageCodec.dHash64(img))
        }
      })
      .toDF("media_id", "phash")
  }

  /** Near-duplicate WAV family: the audio-id rows re-encoded so
    * groups of three consecutive audio ids (gid = id/18 over the
    * %6=1 ids) share a gid-keyed waveform with a variant edit confined
    * to the first two energy windows ([[AudioCodec.variantSample]]) —
    * the m8 variant-image discipline in the time domain. */
  def syntheticVariantWavs(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 6 = 1"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "audio", AudioCodec.encodeSyntheticWavVariant(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Perceptual fingerprint per audio payload: real RIFF data-chunk
    * sample decode → 64-bit energy-delta hash
    * ([[AudioCodec.energyHash64]]). Row-local; non-WAV payloads drop
    * out. Feed to [[Dedup.fingerprintNearDupPairs]] — the audio leg
    * of the text/image/audio fingerprint triad. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decodePcm16(bytes).map(samples =>
          (id, AudioCodec.energyHash64(samples)))
      })
      .toDF("media_id", "afp")
  }

  /** Real RIFF/WAVE payloads for half the audio rows (doc_id % 6 = 1;
    * the other half, doc_id % 6 = 4, are MP3 — [[syntheticMp3s]]):
    * 16-bit mono PCM encoded on executors with sample rate and frame
    * count [[AudioCodec.syntheticParams]] derives from the id, so the
    * DuckDB oracle predicts the duration a REAL header parse must
    * recover. Row-local mapPartitions like [[syntheticImages]]. */
  def syntheticWavs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 6 = 1"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "audio", AudioCodec.encodeSyntheticWav(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Real MPEG-1 Layer III payloads for the other half of the audio
    * rows (doc_id % 6 = 4): valid frame headers with
    * [[Mp3Codec.syntheticParams]] id-derived bitrate/sample-rate/frame
    * count (ID3v2-tagged on even ids), so the oracle predicts the
    * duration a REAL frame walk must recover. */
  def syntheticMp3s(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 6 = 4"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "audio", Mp3Codec.encodeSyntheticMp3(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Real ISO BMFF payloads for half the video rows (doc_id % 6 = 2;
    * the other half, doc_id % 6 = 5, keep the stub text payloads so
    * the degrade path stays exercised): `ftyp`+`moov`+`mdat` boxes
    * with [[Mp4Codec.syntheticParams]] id-derived timescale/duration/
    * dims, so the oracle predicts what a REAL box walk must recover. */
  def syntheticMp4s(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 6 = 2"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "video", Mp4Codec.encodeSyntheticMp4(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** Real uncompressed-AVI payloads (24-bit DIB frames) on the video
    * ids (doc_id % 6 = 2, the same rows [[syntheticMp4s]] uses in the
    * mixed frame — this frame is the m6 input, built independently):
    * every pixel of every frame renders from [[AviCodec.pixel]], so
    * the DuckDB oracle recomputes what a REAL raster decode must sum.
    * Row-local mapPartitions like the other payload builders. */
  def syntheticAvis(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 6 = 2"))
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, "video", AviCodec.encodeSyntheticAvi(id))))
      .toDF("media_id", "kind", "payload")
  }

  /** REAL video frame decode: walk each payload's RIFF structure and
    * sum every frame's channels from the raw DIB rasters — the video
    * analog of [[imageStats]], one output row per frame. Rows whose
    * payload isn't decodable uncompressed AVI are dropped (compressed
    * codecs have no decoder in this environment and degrade here).
    * Row-local flatMap; payloads never shuffle. */
  def videoFrameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AviCodec.frameStats(bytes).toSeq.flatten.map {
          case (f, w, h, r, g, b) => (id, f, w, h, r, g, b)
        }
      })
      .toDF("media_id", "frame_no", "width", "height",
        "r_sum", "g_sum", "b_sum")
  }

  /** Windowed audio energy over REAL decoded PCM samples: one row per
    * `windowFrames`-sample window with its exact sum of squared
    * amplitudes — the per-sample DSP analog of [[imageStats]]' pixel
    * sums and [[videoFrameStats]]' per-frame rasters (silence/clipping
    * detection, VAD pre-filters in deployment). Rows whose payload is
    * not decodable 16-bit mono PCM are dropped, the shared media-codec
    * degrade contract. Row-local flatMap — no shuffle; output is
    * ~frames/windowFrames rows per blob, integer-exact, so the DuckDB
    * oracle predicts every window from the synthetic sample formula
    * (a green row proves a REAL RIFF data-chunk sample decode ran). */
  def audioEnergy(media: DataFrame, windowFrames: Int = 100): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decodePcm16(bytes).toSeq.flatMap { samples =>
          samples.grouped(windowFrames).zipWithIndex.map {
            case (win, w) =>
              var sumsq = 0L
              var i = 0
              while (i < win.length) {
                sumsq += win(i).toLong * win(i); i += 1
              }
              (id, w, win.length, sumsq)
          }
        }
      })
      .toDF("media_id", "window_idx", "n_frames", "sumsq")
  }

  /** The full multimodal frame: real image payloads (PNG/JPEG), real
    * audio payloads (WAV + MP3), real video containers (MP4) plus stub
    * text-byte video payloads — one row per document. */
  def mixedMedia(spark: SparkSession, sfDir: String): DataFrame =
    syntheticImages(spark, sfDir)
      .unionByName(syntheticWavs(spark, sfDir))
      .unionByName(syntheticMp3s(spark, sfDir))
      .unionByName(syntheticMp4s(spark, sfDir))
      .unionByName(syntheticMedia(spark, sfDir)
        .filter(expr("media_id % 6 = 5")))
}
