package graft.operators

import java.io.ByteArrayOutputStream

/** Real, pure-JVM AVI (RIFF) codec for uncompressed 24-bit DIB video:
  * the one video container whose FRAMES are decodable without any
  * codec library, because the samples are raw bottom-up BGR rasters
  * (`BI_RGB` BITMAPINFOHEADER, `00db` chunks) — the classic
  * "uncompressed AVI". This closes the last stubbed multimodal path
  * with an honest real decode: metadata comes from walking the actual
  * `hdrl → avih` header, and [[frameStats]] decodes every pixel of
  * every frame (stride-padded rows, bottom-up order, BGR channel
  * swap). Compressed codecs (H.264 etc.) remain out of scope — no
  * codec library exists in this environment, and the reference has no
  * video at all.
  *
  * Same scale contract as [[ImageCodec]]/[[Mp4Codec]]: row-local,
  * magic-byte sniffed (corrupt payloads degrade to None → callers
  * drop or fall back), cost linear in payload bytes.
  */
object AviCodec {

  /** Deterministic synthetic AVI parameters for media id `id`:
    * (width, height, nFrames, microSecPerFrame). Dims stay small so
    * the DuckDB oracle can recompute per-pixel sums (m6). */
  def syntheticParams(id: Long): (Int, Int, Int, Int) =
    ((id % 24).toInt + 8, (id % 18).toInt + 6, (id % 4).toInt + 2,
      33333 + ((id % 3).toInt * 8334))

  /** Channel values of pixel (x, y) in frame f — the render formula
    * the oracle mirrors arithmetically (the frame-indexed analog of
    * ImageCodec's). */
  def pixel(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) =
    (((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt,
      ((f * 11 + x * 5) % 256).toInt,
      ((f * 19 + y * 3) % 256).toInt)

  private def u16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }
  private def u32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
    o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
  }
  private def tag(o: ByteArrayOutputStream, t: String): Unit =
    o.write(t.getBytes("US-ASCII"), 0, 4)

  /** DIB row stride: rows pad to 4-byte boundaries. */
  def stride(w: Int): Int = (w * 3 + 3) & ~3

  /** Encode a minimal-but-valid uncompressed AVI for `id`:
    * RIFF(AVI ){ LIST hdrl { avih, LIST strl { strh(vids/DIB), strf } },
    * LIST movi { nFrames × 00db } }, frames rendered bottom-up BGR
    * from [[pixel]]. */
  def encodeSyntheticAvi(id: Long): Array[Byte] = {
    val (w, h, nf, usPf) = syntheticParams(id)
    val st = stride(w)

    def chunk(fourcc: String)(body: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      body(b)
      val data = b.toByteArray
      val o = new ByteArrayOutputStream()
      tag(o, fourcc); u32(o, data.length.toLong); o.write(data, 0, data.length)
      if (data.length % 2 == 1) o.write(0) // RIFF chunks pad to even
      o.toByteArray
    }
    def list(listType: String, children: Seq[Array[Byte]]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      tag(o, "LIST"); u32(o, (4 + children.map(_.length).sum).toLong)
      tag(o, listType); children.foreach(c => o.write(c, 0, c.length))
      o.toByteArray
    }

    val avih = chunk("avih") { o =>
      u32(o, usPf.toLong); u32(o, 0); u32(o, 0); u32(o, 0) // usPerFrame, maxBps, padding, flags
      u32(o, nf.toLong); u32(o, 0); u32(o, 1); u32(o, 0) // totalFrames, initial, streams, sugBuf
      u32(o, w.toLong); u32(o, h.toLong)
      for (_ <- 0 until 4) u32(o, 0) // reserved
    }
    val strh = chunk("strh") { o =>
      tag(o, "vids"); tag(o, "DIB ")
      u32(o, 0); u32(o, 0); u32(o, 0) // flags, prio+lang, initialFrames
      u32(o, usPf.toLong); u32(o, 1000000L) // scale, rate → fps = rate/scale
      u32(o, 0); u32(o, nf.toLong) // start, length (frames)
      u32(o, (st * h).toLong); u32(o, 0xFFFFFFFFL); u32(o, 0) // sugBuf, quality, sampleSize
      u16(o, 0); u16(o, 0); u16(o, w); u16(o, h) // rcFrame
    }
    val strf = chunk("strf") { o =>
      u32(o, 40); u32(o, w.toLong); u32(o, h.toLong) // biSize, biWidth, biHeight (+ = bottom-up)
      u16(o, 1); u16(o, 24) // planes, bitcount
      u32(o, 0); u32(o, (st * h).toLong) // BI_RGB, biSizeImage
      u32(o, 0); u32(o, 0); u32(o, 0); u32(o, 0) // pels, clr
    }
    val frames = (0 until nf).map { f =>
      chunk("00db") { o =>
        var y = h - 1 // bottom-up row order
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val (r, g, b) = pixel(id, f, x, y)
            o.write(b); o.write(g); o.write(r) // BGR
            x += 1
          }
          var p = w * 3
          while (p < st) { o.write(0); p += 1 } // row padding
          y -= 1
        }
      }
    }
    val riffBody = {
      val o = new ByteArrayOutputStream()
      tag(o, "AVI ")
      val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
      val movi = list("movi", frames)
      o.write(hdrl, 0, hdrl.length); o.write(movi, 0, movi.length)
      o.toByteArray
    }
    val out = new ByteArrayOutputStream()
    tag(out, "RIFF"); u32(out, riffBody.length.toLong)
    out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }

  /** RIFF/AVI from magic bytes. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
      bytes(10) == 'I' && bytes(11) == ' '

  private def readU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Advance past the chunk at `p`, or -1 when its 32-bit size field
    * walks outside [p, end) — including sizes >= 2^31, which a naive
    * `.toInt` would turn negative and drive the walk to a negative
    * index. All arithmetic in Long. */
  private def nextChunk(b: Array[Byte], p: Int, end: Int): Int = {
    val size = readU32(b, p + 4) // u32, always >= 0 as a Long
    val next = p.toLong + 8L + size + (size % 2)
    if (size > Int.MaxValue.toLong || next <= p.toLong || next > end.toLong) -1
    else next.toInt
  }

  /** First LIST of `listType` in [start, end): body bounds
    * (after the listType tag). */
  private def findList(b: Array[Byte], start: Int, end: Int,
      listType: String): Option[(Int, Int)] = {
    var p = start
    while (p + 8 <= end) {
      val next = nextChunk(b, p, end)
      if (next < 0) return None
      if (fourcc(b, p) == "LIST" && p + 12 <= end &&
        fourcc(b, p + 8) == listType)
        return Some((p + 12, p + 8 + readU32(b, p + 4).toInt))
      p = next
    }
    None
  }

  /** First plain chunk of `cc` in [start, end): data bounds. */
  private def findChunk(b: Array[Byte], start: Int, end: Int,
      cc: String): Option[(Int, Int)] = {
    var p = start
    while (p + 8 <= end) {
      val next = nextChunk(b, p, end)
      if (next < 0) return None
      if (fourcc(b, p) == cc)
        return Some((p + 8, p + 8 + readU32(b, p + 4).toInt))
      p = next
    }
    None
  }

  /** Real header walk: (width, height, nFrames, microSecPerFrame) from
    * `hdrl → avih`; None for non-AVI or corrupt payloads. */
  def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] =
    if (!sniff(bytes)) None
    else try {
      val end = 8 + readU32(bytes, 4).toInt min bytes.length
      for {
        (hs, he) <- findList(bytes, 12, end, "hdrl")
        (as, _) <- findChunk(bytes, hs, he, "avih")
      } yield (readU32(bytes, as + 32).toInt, readU32(bytes, as + 36).toInt,
        readU32(bytes, as + 16).toInt, readU32(bytes, as).toInt)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL pixel decode of every `00db` frame: per-frame per-channel
    * sums (the video analog of [[ImageCodec.channelSums]]) — undoes
    * the bottom-up row order, 4-byte row stride, and BGR layout.
    * Returns None for non-AVI/corrupt payloads (same degrade-to-None
    * contract as [[decodeMeta]]: the whole body is guarded, so a
    * payload that sniffs as AVI but lies later never throws out of one
    * row of a job); `frame_no` counts every `00db` chunk by stream
    * position — a truncated mid-stream frame skips only its EMISSION,
    * it does not shift later frames' numbers. */
  def frameStats(bytes: Array[Byte])
      : Option[Seq[(Int, Int, Int, Long, Long, Long)]] =
    try {
      decodeMeta(bytes).flatMap { case (w, h, _, _) =>
        val end = 8 + readU32(bytes, 4).toInt min bytes.length
        val need = stride(w).toLong * h.toLong // Long: header dims are
        // attacker-controlled u32s, `stride(w) * h` in Int can overflow
        if (w <= 0 || h <= 0 || need > bytes.length.toLong) None
        else findList(bytes, 12, end, "movi").map { case (ms, me) =>
          val st = stride(w)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Int, Int, Long, Long, Long)]
          var p = ms
          var f = 0
          while (p + 8 <= me) {
            val next = nextChunk(bytes, p, me)
            if (next < 0) { p = me } // corrupt tail: stop
            else {
              if (fourcc(bytes, p) == "00db") {
                val size = readU32(bytes, p + 4)
                val data = p + 8
                if (size >= need && data.toLong + need <= bytes.length.toLong) {
                  var rs = 0L; var gs = 0L; var bs = 0L
                  var y = 0
                  while (y < h) {
                    val row = data + (h - 1 - y) * st // bottom-up
                    var x = 0
                    while (x < w) {
                      bs += bytes(row + x * 3) & 0xFF
                      gs += bytes(row + x * 3 + 1) & 0xFF
                      rs += bytes(row + x * 3 + 2) & 0xFF
                      x += 1
                    }
                    y += 1
                  }
                  out += ((f, w, h, rs, gs, bs))
                }
                f += 1 // stream-position numbering, decoded or not
              }
              p = next
            }
          }
          out.toSeq
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
