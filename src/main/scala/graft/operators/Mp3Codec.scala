package graft.operators

import java.io.ByteArrayOutputStream

/** Real, pure-JVM MPEG audio (MP3) metadata codec: duration comes from
  * walking the actual MPEG-1 Layer III frame structure — sync word,
  * bitrate/sample-rate table lookups, per-frame length arithmetic, and
  * an ID3v2 tag skip — exactly what a probe tool does to time an MP3
  * without decoding it. This closes the "compressed audio" stub left
  * after [[AudioCodec]] (WAV): both audio containers now get a real
  * byte parse. Reference analog: the reference stores MP3 durations on
  * its audio sidecar metadata (ina/classes.py:104-106) and never
  * parses payloads; here the duration is recovered from the bytes.
  *
  * Same scale contract as [[ImageCodec]]/[[AudioCodec]]: row-local,
  * magic-byte sniffed so corrupt/mislabeled payloads degrade to the
  * stub path instead of failing a 10k-task stage, and header-only —
  * the walk touches 4 bytes per frame (O(frames), not O(bytes)).
  *
  * Scope: MPEG-1 Layer III, the overwhelmingly common container
  * variant (MPEG-2/2.5 low-sample-rate frames return None and fall to
  * the stub — a documented trade, not a crash).
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14. */
  private val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0..2. */
  private val SampleRates = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  /** Deterministic synthetic MP3 parameters for media id `id` — the
    * oracle recomputes these arithmetically in DuckDB, so a green m1
    * proves the walker recovered them from real frame headers. The
    * sample-rate index derives from `(id / 6) % 3` (not `id % 3`,
    * which the `id % 6 == 4` row selection would pin to a constant):
    * (bitrateIndex, sampleRate, frames). */
  def syntheticParams(id: Long): (Int, Int, Int) = {
    val brIdx = Array(5, 6, 7, 9, 11)((id % 5).toInt) // 64/80/96/128/192 kbps
    val sr = SampleRates(((id / 6) % 3).toInt)
    val frames = 20 + (id % 80).toInt
    (brIdx, sr, frames)
  }

  /** Floor-division duration — mirrored by the DuckDB `//` in m1. */
  def durationMs(frames: Long, sampleRate: Int): Long =
    frames * SamplesPerFrame * 1000L / sampleRate

  /** Frame length in bytes for MPEG-1 Layer III (padding excluded). */
  private def frameLen(brIdx: Int, srIdx: Int): Int =
    144 * BitrateKbps(brIdx) * 1000 / SampleRates(srIdx)

  /** Encode a deterministic MPEG-1 Layer III stream for `id`: valid
    * frame headers, deterministic body bytes (never 0xFF, so the only
    * sync words are real ones), and an ID3v2 tag prefix on even ids so
    * the tag-skip path is exercised by the same corpus. */
  def encodeSyntheticMp3(id: Long): Array[Byte] = {
    val (brIdx, sr, frames) = syntheticParams(id)
    val srIdx = SampleRates.indexOf(sr)
    val out = new ByteArrayOutputStream()
    if (id % 2 == 0) {
      // ID3v2.3 header: "ID3", version 3.0, flags 0, synchsafe size 32
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 32), 0, 10)
      var i = 0
      while (i < 32) { out.write(((id * 17 + i * 11) % 251).toInt); i += 1 }
    }
    val len = frameLen(brIdx, srIdx)
    var f = 0
    while (f < frames) {
      out.write(0xFF)
      out.write(0xFB) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2)) // padding 0, private 0
      out.write(0xC0) // mono
      var i = 4
      while (i < len) { out.write(((id * 31 + f * 13 + i * 7) % 251).toInt); i += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Byte offset of the first audio frame: past an ID3v2 tag when one
    * leads the payload (10-byte header + synchsafe 28-bit size), else
    * 0. */
  private def skipId3(bytes: Array[Byte]): Int =
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      10 + size
    } else 0

  /** MPEG-1 Layer III sync at `off`; the magic-byte gate. */
  def sniff(bytes: Array[Byte]): Boolean = {
    val off = skipId3(bytes)
    bytes.length >= off + 4 && (bytes(off) & 0xFF) == 0xFF &&
      (bytes(off + 1) & 0xFE) == 0xFA // sync + MPEG-1 + Layer III
  }

  /** Real frame walk: (sampleRate, frames, duration_ms) — None for
    * non-MP3 or corrupt payloads (callers fall back to the stub). The
    * walk validates every frame header at its computed offset; it
    * stops at the first invalid or incomplete frame, so a truncated
    * tail never inflates the count. */
  def decode(bytes: Array[Byte]): Option[(Int, Long, Long)] =
    if (!sniff(bytes)) None
    else {
      var off = skipId3(bytes)
      var frames = 0L
      var sampleRate = 0
      var ok = true
      while (ok && off + 4 <= bytes.length) {
        val valid = (bytes(off) & 0xFF) == 0xFF &&
          (bytes(off + 1) & 0xFE) == 0xFA
        if (!valid) ok = false
        else {
          val brIdx = (bytes(off + 2) >> 4) & 0xF
          val srIdx = (bytes(off + 2) >> 2) & 0x3
          if (brIdx < 1 || brIdx > 14 || srIdx > 2) ok = false
          else {
            val len = frameLen(brIdx, srIdx) + ((bytes(off + 2) >> 1) & 1)
            if (len <= 4 || off + len > bytes.length) ok = false
            else {
              val sr = SampleRates(srIdx)
              if (sampleRate == 0) sampleRate = sr
              // variable-sample-rate streams are malformed; bail out
              if (sr != sampleRate) ok = false
              else { frames += 1; off += len }
            }
          }
        }
      }
      if (frames == 0) None
      else Some((sampleRate, frames, durationMs(frames, sampleRate)))
    }
}
