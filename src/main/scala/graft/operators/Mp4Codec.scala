package graft.operators

import java.io.ByteArrayOutputStream

/** Real, pure-JVM MP4 (ISO Base Media File Format) metadata codec:
  * duration comes from walking the actual box structure — top-level
  * `ftyp`/`moov`/`mdat` boxes, then `moov → mvhd` (timescale +
  * duration) and `moov → trak → tkhd` (16.16 fixed-point width/height)
  * — exactly what a probe tool reads to time and size a video without
  * touching a single coded sample. With [[ImageCodec]] (pixels),
  * [[AudioCodec]] (WAV) and [[Mp3Codec]] (MPEG frames) this makes the
  * CONTAINER metadata of all three modalities a real byte parse; only
  * pixel-level video frame decode remains stubbed (no codec libraries
  * in this environment — that is a sample-data concern, not a
  * container concern).
  *
  * Same scale contract as the other codecs: row-local, magic-byte
  * sniffed (corrupt payloads degrade to the stub path), and
  * header-only — the walk skips `mdat` by its declared size, so cost
  * is O(boxes), independent of payload size. 64-bit largesize boxes
  * (the >4 GiB case that WILL occur at 100 TB) are handled.
  */
object Mp4Codec {

  /** Deterministic synthetic MP4 parameters for media id `id` — the
    * oracle recomputes these arithmetically in DuckDB, so a green m1
    * proves the parser recovered them from real boxes. The timescale
    * index derives from `(id / 6) % 3` (not `id % 3`, which the
    * `id % 6 == 2` row selection would pin to a constant):
    * (timescale, durationUnits, width, height). */
  def syntheticParams(id: Long): (Int, Long, Int, Int) =
    (600 + ((id / 6) % 3).toInt * 200, // 600 | 800 | 1000 units/s
      1000L + id % 9000,
      (id % 640).toInt + 16,
      (id % 360).toInt + 16)

  /** Floor-division duration — mirrored by the DuckDB `//` in m1. */
  def durationMs(durationUnits: Long, timescale: Int): Long =
    durationUnits * 1000L / timescale

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }

  private def tag(out: ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"), 0, 4)

  /** Encode a deterministic minimal-but-valid MP4 for `id`: `ftyp`,
    * `moov(mvhd + trak(tkhd))`, and a small `mdat` of deterministic
    * junk standing in for coded samples. All version-0 boxes. */
  def encodeSyntheticMp4(id: Long): Array[Byte] = {
    val (timescale, dur, w, h) = syntheticParams(id)
    val out = new ByteArrayOutputStream()
    // ftyp: major brand isom, minor 0x200, one compatible brand
    u32(out, 20); tag(out, "ftyp"); tag(out, "isom"); u32(out, 0x200)
    tag(out, "isom")
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92))
    u32(out, 8 + 108 + 8 + 92); tag(out, "moov")
    // mvhd v0
    u32(out, 108); tag(out, "mvhd"); u32(out, 0) // version 0, flags 0
    u32(out, 0); u32(out, 0) // creation, modification
    u32(out, timescale); u32(out, dur)
    u32(out, 0x00010000); u32(out, 0x01000000) // rate 1.0; volume 1.0 + reserved
    u32(out, 0); u32(out, 0) // reserved
    // unity matrix
    u32(out, 0x00010000); u32(out, 0); u32(out, 0)
    u32(out, 0); u32(out, 0x00010000); u32(out, 0)
    u32(out, 0); u32(out, 0); u32(out, 0x40000000)
    for (_ <- 0 until 6) u32(out, 0) // pre_defined
    u32(out, 2) // next_track_ID
    // trak(tkhd v0)
    u32(out, 8 + 92); tag(out, "trak")
    u32(out, 92); tag(out, "tkhd"); u32(out, 7) // version 0, flags: enabled
    u32(out, 0); u32(out, 0) // creation, modification
    u32(out, 1); u32(out, 0) // track_ID, reserved
    u32(out, dur)
    u32(out, 0); u32(out, 0) // reserved
    u32(out, 0); u32(out, 0) // layer+alternate_group, volume+reserved
    u32(out, 0x00010000); u32(out, 0); u32(out, 0)
    u32(out, 0); u32(out, 0x00010000); u32(out, 0)
    u32(out, 0); u32(out, 0); u32(out, 0x40000000)
    u32(out, w.toLong << 16); u32(out, h.toLong << 16) // 16.16 fixed
    // mdat: deterministic junk samples
    u32(out, 8 + 16); tag(out, "mdat")
    for (i <- 0 until 16) out.write(((id * 29 + i * 7) % 251).toInt)
    out.toByteArray
  }

  /** ISO BMFF from magic bytes: a `ftyp` box leads the file. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def readU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

  private def readU64(b: Array[Byte], p: Int): Long =
    (readU32(b, p) << 32) | readU32(b, p + 4)

  private def boxType(b: Array[Byte], p: Int): String =
    new String(b, p + 4, 4, "US-ASCII")

  /** (header length, box length) at `p`; None when malformed. Handles
    * size==1 (64-bit largesize) and size==0 (box runs to EOF). */
  private def boxLen(b: Array[Byte], p: Int, end: Int): Option[(Int, Long)] = {
    if (p + 8 > end) return None
    val size = readU32(b, p)
    if (size == 1) {
      if (p + 16 > end) None else Some((16, readU64(b, p + 8)))
    } else if (size == 0) Some((8, (end - p).toLong))
    else if (size < 8) None
    else Some((8, size))
  }

  /** Offset of the first child box of type `t` inside [start, end). */
  private def findBox(b: Array[Byte], start: Int, end: Int,
      t: String): Option[(Int, Int, Long)] = {
    var p = start
    while (p + 8 <= end) {
      boxLen(b, p, end) match {
        case Some((hdr, len)) if len >= hdr && p + len <= end =>
          if (boxType(b, p) == t) return Some((p, hdr, len))
          p += len.toInt
        case _ => return None
      }
    }
    None
  }

  /** Real box-walk decode: (width, height, duration_ms) — None for
    * non-MP4 or corrupt payloads (callers fall back to the stub).
    * Duration from `mvhd` (movie timescale — the probe-standard
    * source); width/height from the first `trak`'s `tkhd` 16.16
    * fixed-point fields, 0 when no track box is present (audio-only
    * ISO BMFF). Version-1 boxes (64-bit times) are read too. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    if (!sniff(bytes)) None
    else try {
      val end = bytes.length
      findBox(bytes, 0, end, "moov").flatMap { case (moov, mhdr, mlen) =>
        val mEnd = (moov + mlen).toInt
        findBox(bytes, moov + mhdr, mEnd, "mvhd").flatMap {
          case (mv, mvhdr, _) =>
            val version = bytes(mv + mvhdr) & 0xFF
            val (timescale, dur) =
              if (version == 1)
                (readU32(bytes, mv + mvhdr + 20), readU64(bytes, mv + mvhdr + 24))
              else
                (readU32(bytes, mv + mvhdr + 12), readU32(bytes, mv + mvhdr + 16))
            if (timescale <= 0) None
            else {
              val wh = findBox(bytes, moov + mhdr, mEnd, "trak")
                .flatMap { case (tk, thdr, tlen) =>
                  findBox(bytes, tk + thdr, (tk + tlen).toInt, "tkhd")
                }
                .map { case (th, thhdr, _) =>
                  val v = bytes(th + thhdr) & 0xFF
                  val base = th + thhdr + 4 + (if (v == 1) 32 else 20) + 8 + 8 + 36
                  ((readU32(bytes, base) >> 16).toInt,
                    (readU32(bytes, base + 4) >> 16).toInt)
                }
              val (w, h) = wh.getOrElse((0, 0))
              Some((w, h, durationMs(dur, timescale.toInt)))
            }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
