package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real, pure-JVM WAV metadata codec for the multimodal operators —
  * `javax.sound.sampled` ships in the JDK and parses WAV headers
  * (sample rate, frame count) without any external library, the same
  * way [[ImageCodec]] uses `javax.imageio` for PNG/JPEG. This closes
  * the "no audio libraries exist in this environment" stub for the WAV
  * container; video (and compressed audio like MP3) legitimately stay
  * stubbed. Reference analog: the reference reads MP3 durations off
  * its audio sidecar metadata (ina/classes.py:104-106), which the
  * import models as enrichment — here the duration comes from really
  * parsing the payload bytes.
  *
  * Same scale contract as [[ImageCodec]]: row-local (called from
  * `mapPartitions`), magic-byte sniffed so corrupt/mislabeled payloads
  * degrade to the stub path instead of killing a 10k-task stage, and
  * header-only parsing — `decode` never reads the PCM body, so cost
  * per row is independent of payload size.
  */
object AudioCodec {

  /** Deterministic synthetic WAV parameters for media id `id` — the
    * oracle recomputes these arithmetically in DuckDB, so a green m1
    * proves the decoder recovered them from actual RIFF/WAVE headers:
    * sample rate ∈ {8000..16000 by 2000}, 500..4499 frames, 16-bit
    * mono PCM. duration_ms = frames * 1000 / rate in integer (floor)
    * arithmetic — exact in any engine. */
  def syntheticParams(id: Long): (Int, Long) =
    (8000 + (id % 5).toInt * 2000, 500L + id % 4000)

  /** Floor-division duration — mirrored by the DuckDB `//` in m1. */
  def durationMs(frames: Long, rate: Int): Long = frames * 1000L / rate

  /** Encode a deterministic 16-bit mono PCM WAV for `id`. */
  def encodeSyntheticWav(id: Long): Array[Byte] = {
    val (rate, frames) = syntheticParams(id)
    val pcm = new Array[Byte](frames.toInt * 2)
    var i = 0
    while (i < frames.toInt) {
      val s = (((id * 31 + i * 7) % 251) - 125).toShort
      pcm(2 * i) = (s & 0xFF).toByte // little-endian PCM_SIGNED
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Params for the near-dup variant WAV family: geometry from the
    * GROUP id so all variants of a group align window-for-window;
    * frames ≥ 1300 keep all 65 energy windows of [[energyHash64]]
    * non-degenerate (width ≥ 20). */
  def variantParams(gid: Long): (Int, Long) =
    (8000 + (gid % 5).toInt * 2000, 1300L + gid % 1000)

  /** Sample `i` of variant `variant` in group `gid` — the base
    * pseudo-waveform keyed on gid, with the variant term confined to
    * the first TWO energy windows (i < 2·width), so variants differ
    * only in fingerprint bits 0-2: the localized-edit shape the band
    * blocking of [[graft.operators.Dedup.fingerprintNearDupPairs]]
    * is built for (the m8 discipline, in the time domain). */
  def variantSample(gid: Long, variant: Long, i: Int, width: Long): Short =
    (((gid * 31 + i.toLong * 7 +
      (if (i < 2 * width) variant * 53 * i else 0L)) % 251) - 125).toShort

  /** Encode one member of the near-dup variant WAV family. */
  def encodeSyntheticWavVariant(id: Long): Array[Byte] = {
    val gid = id / 18; val variant = (id / 6) % 3
    val (rate, frames) = variantParams(gid)
    val width = frames / 65
    val pcm = new Array[Byte](frames.toInt * 2)
    var i = 0
    while (i < frames.toInt) {
      val s = variantSample(gid, variant, i, width)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** 64-bit energy-delta fingerprint of a PCM stream (the
    * chromaprint-style perceptual hash reduced to its
    * engine-reproducible floor): 65 equal windows of
    * width = max(frames/65, 1), E(k) = Σ s² over window k
    * (integer-exact), bit k set when E(k+1) > E(k). Robust to uniform
    * gain changes of the energy profile's SHAPE; a local edit perturbs
    * only the bit positions of the touched windows. Trailing samples
    * past 65·width are excluded (all engines replay the same 65·width
    * prefix). */
  def energyHash64(samples: Array[Short]): Long = {
    val w = math.max(samples.length / 65, 1).toInt
    val e = new Array[Long](65)
    var k = 0
    while (k < 65) {
      var s = 0L
      var i = k * w
      val end = math.min((k + 1) * w, samples.length)
      while (i < end) { s += samples(i).toLong * samples(i); i += 1 }
      e(k) = s
      k += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) { if (e(b + 1) > e(b)) hash |= 1L << b; b += 1 }
    hash
  }

  /** RIFF/WAVE container from magic bytes; None when not WAV. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** Real PCM SAMPLE decode: the signed 16-bit mono little-endian
    * sample stream — None for non-WAV, corrupt, or any other sample
    * format (same degrade-to-None contract as [[decode]]; one corrupt
    * blob must never throw out of a task). Bounded by the header's
    * frame count, so a hostile length field cannot balloon the read
    * past the actual payload. */
  def decodePcm16(bytes: Array[Byte]): Option[Array[Short]] =
    if (!sniff(bytes)) None
    else try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
            f.isBigEndian || frames <= 0 || frames > Int.MaxValue / 2) None
        else {
          val pcm = in.readNBytes(frames.toInt * 2)
          val out = new Array[Short](pcm.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) =
              ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real header decode: (sampleRate, frames, duration_ms) — None for
    * non-WAV or corrupt payloads (callers fall back to the stub). */
  def decode(bytes: Array[Byte]): Option[(Int, Long, Long)] =
    if (!sniff(bytes)) None
    else try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val rate = in.getFormat.getSampleRate.toInt
        val frames = in.getFrameLength
        if (rate <= 0 || frames < 0) None
        else Some((rate, frames, durationMs(frames, rate)))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
