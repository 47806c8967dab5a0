package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioCodec, AviCodec, ImageCodec, Mp3Codec, Mp4Codec, Multimodal}

/** Real-codec coverage for the multimodal operators: javax.imageio
  * PNG/JPEG decode, aspect-fit resize round-trip, and the garbage-blob
  * fallback contract. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PNG and JPEG synthetic payloads decode to the formula dims") {
    for (id <- Seq(0L, 3L, 6L, 57L, 114L, 4023L)) {
      val bytes = ImageCodec.encodeSynthetic(id)
      val Some((fmt, w, h)) = ImageCodec.decode(bytes)
      val expectFmt = if (id % 2 == 0) "image/png" else "image/jpeg"
      assert(fmt == expectFmt, s"id=$id")
      assert((w, h) == ImageCodec.syntheticDims(id), s"id=$id")
    }
  }

  test("PNG round-trips exact pixels") {
    // Lossless container: decoded pixels must equal the render formula.
    val id = 42L
    val bytes = ImageCodec.encodeSynthetic(id)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val (w, h) = ImageCodec.syntheticDims(id)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (id * 31 + x * 7 + y * 13) & 0xFF
      val expected = (v << 16 | ((x * 5) & 0xFF) << 8 | ((y * 3) & 0xFF)).toInt
      assert((img.getRGB(x, y) & 0xFFFFFF) == expected, s"($x,$y)")
    }
  }

  test("resize round-trip: emitted bytes re-decode to aspect-fit dims") {
    for (id <- Seq(0L, 3L, 9L, 57L, 171L)) {
      val bytes = ImageCodec.encodeSynthetic(id)
      val Some(out) = ImageCodec.resize(bytes, 320, 240)
      val Some((fmt, w, h)) = ImageCodec.decode(out)
      val (sw, sh) = ImageCodec.syntheticDims(id)
      assert(fmt == "image/png")
      assert((w, h) == ImageCodec.fitDims(sw, sh, 320, 240), s"id=$id")
      // aspect-fit really fits: one side hits the target box
      assert(w == 320 || h == 240)
      assert(w <= 320 && h <= 240)
    }
  }

  test("fitDims integer math matches the oracle's CASE expression") {
    for (w <- 1 to 80; h <- 1 to 60) {
      val (ow, oh) = ImageCodec.fitDims(w, h, 320, 240)
      val (ew, eh) =
        if (w * 240 >= h * 320) (320, h * 320 / w) else (w * 240 / h, 240)
      assert((ow, oh) == (ew, eh), s"($w,$h)")
    }
  }

  test("garbage and truncated payloads fall back, never throw") {
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    // valid magic, corrupt body — sniff passes, decode must not throw
    val corrupt = ImageCodec.encodeSynthetic(8L).take(12)
    assert(ImageCodec.decode(corrupt).isEmpty)
    assert(ImageCodec.resize(corrupt, 320, 240).isEmpty)
  }

  test("extractMetadata decodes real image and WAV rows and stubs the rest") {
    val meta = Multimodal.extractMetadata(Multimodal.mixedMedia(spark, sf))
    val kinds = meta.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.contains("image/png") && kinds.contains("image/jpeg"))
    assert(kinds.contains("audio/wav") && kinds.contains("video"))
    // every image row carries formula dims, proving a real parse
    val bad = meta.filter(col("kind").startsWith("image/") &&
      (col("width") =!= expr("media_id % 57 + 8") ||
       col("height") =!= expr("media_id % 43 + 8"))).count()
    assert(bad == 0)
    // every WAV row carries the formula duration, proving the header
    // parse (floor((500 + id%4000)*1000 / (8000 + (id%5)*2000)))
    val badWav = meta.filter(col("kind") === "audio/wav" &&
      (col("duration_ms") =!=
        expr("(500 + media_id % 4000) * 1000 div (8000 + (media_id % 5) * 2000)") ||
       col("width") =!= 0 || col("height") =!= 0)).count()
    assert(badWav == 0)
  }

  test("WAV codec round-trips rate/frames and rejects garbage") {
    for (id <- Seq(1L, 4L, 7L, 22L, 4001L)) {
      val bytes = AudioCodec.encodeSyntheticWav(id)
      val (rate, frames) = AudioCodec.syntheticParams(id)
      val Some((dr, df, dur)) = AudioCodec.decode(bytes)
      assert((dr, df) == (rate, frames), s"id=$id")
      assert(dur == frames * 1000L / rate)
    }
    assert(AudioCodec.decode(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.decode("RIFFnope".getBytes).isEmpty)
    // valid magic, truncated body — sniff passes, decode must not throw
    val corrupt = AudioCodec.encodeSyntheticWav(5L).take(16)
    assert(AudioCodec.decode(corrupt).isEmpty)
    // a WAV payload is not an image and vice versa (dispatch is disjoint)
    assert(ImageCodec.decode(AudioCodec.encodeSyntheticWav(3L)).isEmpty)
    assert(AudioCodec.decode(ImageCodec.encodeSynthetic(4L)).isEmpty)
  }

  test("MP3 frame walk recovers rate/frames and rejects garbage") {
    // even ids carry an ID3v2 tag prefix, odd ids start at the first
    // frame — both paths through skipId3
    for (id <- Seq(4L, 10L, 16L, 22L, 3998L, 7L, 13L, 4003L)) {
      val bytes = Mp3Codec.encodeSyntheticMp3(id)
      val (_, sr, frames) = Mp3Codec.syntheticParams(id)
      val Some((dr, df, dur)) = Mp3Codec.decode(bytes)
      assert((dr, df) == (sr, frames.toLong), s"id=$id")
      assert(dur == frames.toLong * 1152 * 1000 / sr)
    }
    assert(Mp3Codec.decode(Array.emptyByteArray).isEmpty)
    assert(Mp3Codec.decode("not audio at all".getBytes).isEmpty)
    // valid sync, truncated first frame — walker must count 0 frames
    assert(Mp3Codec.decode(Mp3Codec.encodeSyntheticMp3(7L).take(16)).isEmpty)
    // ID3 tag alone (no frames behind it)
    assert(Mp3Codec.decode(Mp3Codec.encodeSyntheticMp3(4L).take(42)).isEmpty)
    // a trailing partial frame must not inflate the count
    val whole = Mp3Codec.encodeSyntheticMp3(13L)
    val clipped = Mp3Codec.decode(whole.dropRight(1)).get
    assert(clipped._2 == Mp3Codec.syntheticParams(13L)._3 - 1L)
    // dispatch is disjoint with the other codecs
    assert(Mp3Codec.decode(AudioCodec.encodeSyntheticWav(3L)).isEmpty)
    assert(Mp3Codec.decode(ImageCodec.encodeSynthetic(4L)).isEmpty)
    assert(AudioCodec.decode(Mp3Codec.encodeSyntheticMp3(4L)).isEmpty)
  }

  test("MP4 box walk recovers timescale duration and tkhd dims") {
    for (id <- Seq(2L, 8L, 14L, 20L, 3998L)) {
      val bytes = Mp4Codec.encodeSyntheticMp4(id)
      val (ts, units, w, h) = Mp4Codec.syntheticParams(id)
      val Some((dw, dh, dur)) = Mp4Codec.decode(bytes)
      assert((dw, dh) == (w, h), s"id=$id")
      assert(dur == units * 1000L / ts, s"id=$id")
    }
    assert(Mp4Codec.decode(Array.emptyByteArray).isEmpty)
    assert(Mp4Codec.decode("junkjunkjunkjunk".getBytes).isEmpty)
    // ftyp magic but no moov — sniff passes, decode degrades
    assert(Mp4Codec.decode(Mp4Codec.encodeSyntheticMp4(2L).take(20)).isEmpty)
    // truncated mid-moov must not throw
    assert(Mp4Codec.decode(Mp4Codec.encodeSyntheticMp4(8L).take(60)).isEmpty)
    // dispatch is disjoint with the other codecs
    assert(Mp4Codec.decode(Mp3Codec.encodeSyntheticMp3(4L)).isEmpty)
    assert(Mp3Codec.decode(Mp4Codec.encodeSyntheticMp4(2L)).isEmpty)
    assert(ImageCodec.decode(Mp4Codec.encodeSyntheticMp4(2L)).isEmpty)
  }

  test("MP4 64-bit largesize and version-1 boxes parse") {
    // rewrite the synthetic moov as a largesize box: size=1 + 64-bit
    // length; the walker must honor the 16-byte header
    val bytes = Mp4Codec.encodeSyntheticMp4(14L)
    val moovAt = 20 // after the 20-byte ftyp
    val moovLen = ((bytes(moovAt) & 0xFF) << 24) |
      ((bytes(moovAt + 1) & 0xFF) << 16) |
      ((bytes(moovAt + 2) & 0xFF) << 8) | (bytes(moovAt + 3) & 0xFF)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, moovAt)
    out.write(Array[Byte](0, 0, 0, 1)) // size == 1 → largesize follows
    out.write(bytes, moovAt + 4, 4) // "moov"
    val big = java.nio.ByteBuffer.allocate(8).putLong(moovLen + 8L).array()
    out.write(big)
    out.write(bytes, moovAt + 8, bytes.length - moovAt - 8)
    val Some((w, h, dur)) = Mp4Codec.decode(out.toByteArray)
    val (ts, units, ew, eh) = Mp4Codec.syntheticParams(14L)
    assert((w, h, dur) == ((ew, eh, units * 1000L / ts)))
  }

  test("AVI RIFF walk decodes header AND raw DIB frame pixels") {
    for (id <- Seq(2L, 8L, 14L, 20L, 3998L)) {
      val bytes = AviCodec.encodeSyntheticAvi(id)
      val (w, h, nf, usPf) = AviCodec.syntheticParams(id)
      assert(AviCodec.sniff(bytes))
      assert(AviCodec.decodeMeta(bytes).contains((w, h, nf, usPf)), s"id=$id")
      val Some(frames) = AviCodec.frameStats(bytes)
      assert(frames.length == nf, s"id=$id")
      // every frame's channel sums equal the render formula, i.e. the
      // decode undid bottom-up rows, stride padding, and BGR order
      frames.foreach { case (f, fw, fh, rs, gs, bs) =>
        assert((fw, fh) == (w, h))
        var er = 0L; var eg = 0L; var eb = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = AviCodec.pixel(id, f, x, y)
          er += r; eg += g; eb += b
        }
        assert((rs, gs, bs) == ((er, eg, eb)), s"id=$id frame=$f")
      }
    }
    // corrupt payloads degrade to None, never throw
    assert(AviCodec.decodeMeta(Array.emptyByteArray).isEmpty)
    assert(AviCodec.decodeMeta("RIFFjunkjunkjunk".getBytes).isEmpty)
    assert(AviCodec.frameStats(
      AviCodec.encodeSyntheticAvi(2L).take(40)).isEmpty)
    // dispatch is disjoint with the other codecs
    assert(AviCodec.decodeMeta(Mp4Codec.encodeSyntheticMp4(2L)).isEmpty)
    assert(Mp4Codec.decode(AviCodec.encodeSyntheticAvi(2L)).isEmpty)
    assert(ImageCodec.decode(AviCodec.encodeSyntheticAvi(2L)).isEmpty)
    // frame sampling sizes counts from the REAL AVI duration:
    // id=2 → 4 frames × 50 001 µs = 200 ms → 4 samples at 50 ms stride
    val sampled = Multimodal.sampleFrames(
      Multimodal.syntheticAvis(spark, sf).filter(col("media_id") === 2L),
      strideMs = 50, maxFrames = 10)
    assert(sampled.count() == 4)
  }

  test("AVI hostile payloads: oversized sizes/dims degrade, numbering holds") {
    // little-endian helpers over a mutable copy of a valid AVI
    def putU32(b: Array[Byte], p: Int, v: Long): Unit = {
      b(p) = (v & 0xFF).toByte; b(p + 1) = ((v >> 8) & 0xFF).toByte
      b(p + 2) = ((v >> 16) & 0xFF).toByte; b(p + 3) = ((v >> 24) & 0xFF).toByte
    }
    def getU32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    def find(b: Array[Byte], cc: String, from: Int = 0): Int = {
      val t = cc.getBytes("US-ASCII")
      var p = from
      while (p + 4 <= b.length &&
        !(b(p) == t(0) && b(p + 1) == t(1) && b(p + 2) == t(2) &&
          b(p + 3) == t(3))) p += 1
      assert(p + 4 <= b.length, s"$cc not found"); p
    }

    // 1. a movi chunk whose 32-bit size field is >= 2^31 must stop the
    //    walk (degrade), not drive a negative index read
    val big = AviCodec.encodeSyntheticAvi(1L) // id=1 → 3 frames
    val firstDb = find(big, "00db")
    putU32(big, firstDb + 4, 0x80000000L)
    assert(AviCodec.frameStats(big).contains(Nil)) // no throw, no frames

    // 2. oversized header dims (st*h would overflow Int) must degrade
    //    to None, not read out of bounds
    val wide = AviCodec.encodeSyntheticAvi(1L)
    val avihData = find(wide, "avih") + 8
    putU32(wide, avihData + 32, 0x40000000L) // biWidth = 2^30
    putU32(wide, avihData + 36, 0x40000000L) // biHeight = 2^30
    assert(AviCodec.frameStats(wide).isEmpty)

    // 3. a truncated MID-STREAM frame skips only its emission: later
    //    frames keep their stream-position frame_no. Rebuild movi with
    //    frame 1's chunk declared (and laid out) 4 bytes long.
    val src = AviCodec.encodeSyntheticAvi(1L)
    val (w1, h1, nf1, _) = AviCodec.syntheticParams(1L)
    assert(nf1 == 3)
    val moviTag = find(src, "movi")
    val headerPart = java.util.Arrays.copyOfRange(src, 0, moviTag + 4)
    def frameChunk(at: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(src, at, at + 8 + getU32(src, at + 4).toInt)
    // chunk-boundary walk (a byte search could false-match pixel data)
    def nextAt(b: Array[Byte], p: Int): Int = {
      val sz = getU32(b, p + 4).toInt; p + 8 + sz + (sz % 2)
    }
    val f0 = moviTag + 4
    val f1 = nextAt(src, f0)
    val f2 = nextAt(src, f1)
    assert(Seq(f0, f1, f2).forall(p =>
      new String(src, p, 4, "US-ASCII") == "00db"))
    val shortF1 = Array[Byte]('0', '0', 'd', 'b', 4, 0, 0, 0, 9, 9, 9, 9)
    val movi = frameChunk(f0) ++ shortF1 ++ frameChunk(f2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(headerPart) // up to and including "movi" list type tag
    out.write(movi)
    val patched = out.toByteArray
    // fix the movi LIST size (4-byte type tag + children) and RIFF size
    putU32(patched, moviTag - 8 + 4, 4L + movi.length)
    putU32(patched, 4, patched.length - 8L)
    val Some(frames) = AviCodec.frameStats(patched)
    assert(frames.map(_._1) == Seq(0, 2), "frame_no must track stream position")
    frames.foreach { case (f, fw, fh, rs, gs, bs) =>
      assert((fw, fh) == (w1, h1))
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h1; x <- 0 until w1) {
        val (r, g, b) = AviCodec.pixel(1L, f, x, y)
        er += r; eg += g; eb += b
      }
      assert((rs, gs, bs) == ((er, eg, eb)), s"frame=$f")
    }
  }

  test("extractMetadata decodes real MP3 and MP4 rows") {
    val meta = Multimodal.extractMetadata(Multimodal.mixedMedia(spark, sf))
    val kinds = meta.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.contains("audio/mpeg") && kinds.contains("video/mp4"))
    assert(kinds.contains("video"), "stub degrade path must survive")
    // every MP3 row carries the frame-walk duration
    val badMp3 = meta.filter(col("kind") === "audio/mpeg" &&
      (col("duration_ms") =!= expr(
        """(20 + media_id % 80) * 1152 * 1000 div
           (CASE (media_id div 6) % 3 WHEN 0 THEN 44100
                 WHEN 1 THEN 48000 ELSE 32000 END)""") ||
       col("width") =!= 0 || col("height") =!= 0)).count()
    assert(badMp3 == 0)
    // every MP4 row carries the mvhd duration and tkhd dims
    val badMp4 = meta.filter(col("kind") === "video/mp4" &&
      (col("duration_ms") =!= expr(
        "(1000 + media_id % 9000) * 1000 div (600 + ((media_id div 6) % 3) * 200)") ||
       col("width") =!= expr("media_id % 640 + 16") ||
       col("height") =!= expr("media_id % 360 + 16"))).count()
    assert(badMp4 == 0)
  }

  test("imageStats decodes pixel content and drops non-image rows") {
    import spark.implicits._
    val media = Seq(
      (42L, ImageCodec.encodeSynthetic(42L)),
      (7L, "definitely not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.imageStats(media).collect()
    assert(out.length == 1, "non-image rows must be dropped")
    val row = out.head
    val (w, h) = ImageCodec.syntheticDims(42L)
    assert(row.getInt(1) == w && row.getInt(2) == h)
    // formula sums: r = (42*31 + x*7 + y*13) & 0xFF per pixel
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      er += (42L * 31 + x * 7 + y * 13) & 0xFF
      eg += (x * 5) & 0xFF
      eb += (y * 3) & 0xFF
    }
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) == ((er, eg, eb)))
  }

  test("frame sampling sizes frame counts from the real WAV duration") {
    import spark.implicits._
    // id 3499: rate 16000 (3499%5=4), 3999 frames -> 249 ms parsed
    // duration; stride 50 ms, maxFrames 5 -> min(5, 249/50) = 4 frames
    val media = Seq(
      (3499L, "audio", graft.operators.AudioCodec.encodeSyntheticWav(3499L)),
      (7L, "video", "just some text bytes".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val frames = Multimodal.sampleFrames(media, strideMs = 50, maxFrames = 5)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (rate, nFrames) = graft.operators.AudioCodec.syntheticParams(3499L)
    val expect = math.min(5, math.max(1,
      nFrames * 1000 / rate / 50)).toInt
    assert(frames(3499L) == expect, s"real WAV duration must size frames")
    // stub fallback: 20 bytes * 7 = 140 ms -> min(5, 140/50=2) = 2
    assert(frames(7L) == 2)
  }

  test("resize keeps payloads row-local (no exchange in the plan)") {
    val resized = Multimodal.resize(Multimodal.mixedMedia(spark, sf), 320, 240)
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"blob-in/blob-out must not shuffle payloads:\n$plan")
  }

  test("video frame stats keep payloads row-local (no exchange in the plan)") {
    val stats = Multimodal.videoFrameStats(Multimodal.syntheticAvis(spark, sf))
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"frame decode must not shuffle payloads:\n$plan")
  }

  test("decodePcm16 recovers the exact synthetic sample stream") {
    val id = 1234L
    val (_, nFrames) = graft.operators.AudioCodec.syntheticParams(id)
    val samples = graft.operators.AudioCodec.decodePcm16(
      graft.operators.AudioCodec.encodeSyntheticWav(id)).get
    assert(samples.length == nFrames.toInt)
    (0 until samples.length).foreach { i =>
      assert(samples(i) == (((id * 31 + i * 7) % 251) - 125).toShort)
    }
    // non-WAV and truncated payloads degrade to None, never throw
    assert(graft.operators.AudioCodec.decodePcm16("xx".getBytes).isEmpty)
  }

  test("audioEnergy windows: exact per-window squared-amplitude sums") {
    import spark.implicits._
    val id = 31L // % 6 == 1: an audio row id shape
    val media = Seq((id, "audio",
      graft.operators.AudioCodec.encodeSyntheticWav(id)))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.audioEnergy(media, 100)
      .orderBy(col("window_idx")).collect()
    val (_, nFrames) = graft.operators.AudioCodec.syntheticParams(id)
    assert(rows.length == ((nFrames + 99) / 100).toInt)
    val expect0 = (0 until 100).map { i =>
      val s = ((id * 31 + i * 7) % 251) - 125; s * s
    }.sum
    assert(rows.head.getLong(3) == expect0)
    // last window carries the remainder frame count
    assert(rows.map(_.getInt(2).toLong).sum == nFrames)
    // row-local: no exchange before the aggregate-free output
    val plan = Multimodal.audioEnergy(
      Multimodal.syntheticWavs(spark, sf), 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sample decode must not shuffle payloads:\n$plan")
  }

  test("dHash64: hand-built gradient image hashes exactly as defined") {
    // 9x8 image, lum(x, y) = x * 10: every right neighbor is strictly
    // brighter at every grid row -> all 64 bits set
    val up = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = x * 10; up.setRGB(x, y, v << 16 | v << 8 | v)
    }
    assert(graft.operators.ImageCodec.dHash64(up) == -1L)
    // reversed gradient: never brighter -> no bits
    val down = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = (8 - x) * 10; down.setRGB(x, y, v << 16 | v << 8 | v)
    }
    assert(graft.operators.ImageCodec.dHash64(down) == 0L)
    // flipping one mid-grid comparison flips exactly that bit
    val one = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = if (x == 4 && y == 3) 60 else x * 10
      one.setRGB(x, y, v << 16 | v << 8 | v)
    }
    // row j=3: lum at x=3 is 30, x=4 is 60, x=5 is 50 -> bit (3,4)
    // (compare x4>x3: 60>30 set as before) but bit (3,4)=i=4 compares
    // x5>x4: 50>60 false -> bit j*8+i = 3*8+4 = 28 cleared
    assert(graft.operators.ImageCodec.dHash64(one) == (-1L ^ (1L << 28)))
  }

  test("image phash near-dup pairs: every variant pair found through real PNGs") {
    import spark.implicits._
    // two groups of three variants + one unrelated singleton group
    val ids = Seq(0L, 3L, 6L, 9L, 12L, 15L, 900L)
    val media = ids.map(id => (id, "image",
      graft.operators.ImageCodec.encodeSyntheticVariant(id)))
      .toDF("media_id", "kind", "payload")
    val pairs = graft.operators.Dedup.fingerprintNearDupPairs(
      Multimodal.imagePhash(media), "media_id", "phash",
      bands = 4, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    // all six intra-group pairs surface with hamming <= 16
    for (p <- Seq((0L, 3L), (0L, 6L), (3L, 6L),
        (9L, 12L), (9L, 15L), (12L, 15L)))
      assert(pairs.contains(p), s"missing variant pair $p")
    // variant edits are confined to band 0: distances stay <= 16
    assert(pairs.values.forall(_ <= 16))
    // non-image payloads drop out of the hash frame, never throw
    val junk = Seq((1L, "image", "not a png".getBytes))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.imagePhash(junk).count() == 0)
  }

  test("energyHash64: hand-built energy staircases hash exactly as defined") {
    // 130 samples -> width 2, 65 windows; amplitude k in window k ->
    // strictly rising energies -> all 64 bits set
    val up = Array.tabulate(130)(i => (i / 2).toShort)
    assert(graft.operators.AudioCodec.energyHash64(up) == -1L)
    val down = Array.tabulate(130)(i => (65 - i / 2).toShort)
    assert(graft.operators.AudioCodec.energyHash64(down) == 0L)
    // trailing samples past 65*width are excluded: amplitude spike in
    // the remainder changes nothing
    val tail = up ++ Array[Short](999, 999)
    assert(graft.operators.AudioCodec.energyHash64(tail) ==
      graft.operators.AudioCodec.energyHash64(up))
  }

  test("audio fingerprint near-dup pairs: every variant pair found through real WAVs") {
    import spark.implicits._
    // audio ids are %6==1; gid = id/18 groups them in threes
    val ids = Seq(1L, 7L, 13L, 19L, 25L, 31L, 901L)
    val media = ids.map(id => (id, "audio",
      graft.operators.AudioCodec.encodeSyntheticWavVariant(id)))
      .toDF("media_id", "kind", "payload")
    val pairs = graft.operators.Dedup.fingerprintNearDupPairs(
      graft.operators.Multimodal.audioFingerprint(media),
      "media_id", "afp", bands = 4, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    for (p <- Seq((1L, 7L), (1L, 13L), (7L, 13L),
        (19L, 25L), (19L, 31L), (25L, 31L)))
      assert(pairs.contains(p), s"missing variant pair $p")
    // variant edits are confined to the first two energy windows:
    // distances stay tiny
    assert(Seq((1L, 7L), (1L, 13L), (7L, 13L)).forall(pairs(_) <= 3))
    // non-WAV payloads drop out
    val junk = Seq((1L, "audio", "not a wav".getBytes))
      .toDF("media_id", "kind", "payload")
    assert(graft.operators.Multimodal.audioFingerprint(junk).count() == 0)
  }

  test("bands=1 (width 64) masks to the full fingerprint, not zero") {
    import spark.implicits._
    // Scala shifts mod 64: (1L << 64) - 1 == 0, so the single-band
    // degenerate case must special-case its mask or every key is 0
    val hashes = Seq((1L, 42L), (2L, 42L), (3L, 7L))
      .toDF("media_id", "fp")
    val keys = hashes
      .select(graft.operators.Dedup.bandKeys64(col("fp"), 1).as("ks"))
      .collect().map(_.getSeq[Long](0))
    assert(keys.map(_.head).toSet == Set(42L, 7L),
      s"single-band keys must be the fingerprints themselves: ${keys.toSeq}")
    val pairs = graft.operators.Dedup.fingerprintNearDupPairs(
      hashes, "media_id", "fp", bands = 1, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)),
      "bands=1 must pair exact-equal fingerprints only")
  }

  test("image phash pipeline: payloads hash row-local, one band exchange") {
    val hashed = Multimodal.imagePhash(
      Multimodal.syntheticVariantImages(spark, sf))
    val hp = hashed.queryExecution.executedPlan.toString
    assert(!hp.contains("Exchange"),
      s"decode + hash must not shuffle payloads:\n$hp")
    val pp = graft.operators.Dedup.fingerprintNearDupPairs(
      hashed, "media_id", "phash", bands = 4, maxHamming = 16)
      .queryExecution.executedPlan.toString
    // band-bucket groupBy plus the pair dedup (20-byte triples) are
    // the only hash exchanges; pair expansion is in-bucket (no join
    // operators at all — same shape as the simhash/winnow families)
    assert("Exchange hashpartitioning".r.findAllIn(pp).length == 2, pp)
    assert(!pp.contains("SortMergeJoin") && !pp.contains("CartesianProduct"))
  }
}
