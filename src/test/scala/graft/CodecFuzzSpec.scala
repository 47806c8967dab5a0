package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioCodec, AviCodec, ImageCodec, Mp3Codec, Mp4Codec}

/** Hostile-bytes fuzz over every media decode entry point.
  *
  * The decode contract is degrade-to-None, never throw: one corrupt
  * blob must not fail a whole job's task (the round-10 AVI finding was
  * exactly this — a payload that sniffed as AVI with a size field
  * >= 2^31 drove a negative array index out of `frameStats`). Example
  * tests cover the corruptions someone thought of; this spec runs the
  * three corruption families that find the rest:
  *
  *  1. pure random bytes (most die at sniff — the cheap gate);
  *  2. VALID synthetic payloads with random byte splats — these pass
  *     sniff and lie later, the adversarial shape;
  *  3. valid payloads truncated at a random offset, plus a random u32
  *     (biased to huge values) splatted over a 4-byte-aligned word —
  *     the size-field attack specifically.
  *
  * Pure-JVM kernels (no Spark session), so thousands of cases are
  * cheap. Any result is acceptable; only a throw fails.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** All decode surfaces behind one call: a fuzz case that kills any
    * of them fails the property with the codec's name. */
  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "avi.sniff" -> (AviCodec.sniff(_)),
    "avi.decodeMeta" -> (AviCodec.decodeMeta(_)),
    "avi.frameStats" -> (AviCodec.frameStats(_)),
    "mp4.sniff" -> (Mp4Codec.sniff(_)),
    "mp4.decode" -> (Mp4Codec.decode(_)),
    "mp3.sniff" -> (Mp3Codec.sniff(_)),
    "mp3.decode" -> (Mp3Codec.decode(_)),
    "wav.sniff" -> (AudioCodec.sniff(_)),
    "wav.decode" -> (AudioCodec.decode(_)),
    "wav.decodePcm16" -> (AudioCodec.decodePcm16(_)),
    "img.sniff" -> (ImageCodec.sniff(_)),
    "img.decode" -> (ImageCodec.decode(_)),
    "img.resize" -> (ImageCodec.resize(_, 8, 8)),
    "pdf.extract" -> (graft.parse.Pdf.extract(_)),
  )

  /** A tiny one-page PDF whose content varies with `id` — the valid
    * seed for the splat/truncation properties over pdf.extract. */
  private def encodeSyntheticPdf(id: Long): Array[Byte] = {
    val c = s"BT /F1 10 Tf 1 0 0 1 ${20 + id % 400} 700 Tm (doc $id) Tj ET\n"
    val s = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${c.length} >> stream\n" + c +
      "endstream endobj\n%%EOF\n"
    s.getBytes("ISO-8859-1")
  }

  private def survives(bytes: Array[Byte]): Prop = {
    decoders.foreach { case (name, fn) =>
      try fn(bytes)
      catch {
        case scala.util.control.NonFatal(e) =>
          fail(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
            s"on ${bytes.length} bytes")
      }
    }
    Prop.passed
  }

  private val encoders: Seq[Long => Array[Byte]] = Seq(
    AviCodec.encodeSyntheticAvi, Mp4Codec.encodeSyntheticMp4,
    Mp3Codec.encodeSyntheticMp3, AudioCodec.encodeSyntheticWav,
    ImageCodec.encodeSynthetic, encodeSyntheticPdf)

  private val validPayload: Gen[Array[Byte]] = for {
    enc <- Gen.oneOf(encoders)
    id <- Gen.choose(0L, 1000000L)
  } yield enc(id)

  test("random bytes never throw out of any decoder") {
    check("random", Prop.forAll(
      Gen.choose(0, 2000).flatMap(n =>
        Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))))(
      survives _))
  }

  test("valid payloads with random byte splats never throw") {
    val gen = for {
      payload <- validPayload
      nMut <- Gen.choose(1, 16)
      muts <- Gen.listOfN(nMut, for {
        pos <- Gen.choose(0, payload.length - 1)
        v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield (pos, v))
    } yield {
      val b = payload.clone()
      muts.foreach { case (p, v) => b(p) = v }
      b
    }
    check("splat", Prop.forAll(gen)(survives _))
  }

  test("truncations and huge-u32 size-field splats never throw") {
    val gen = for {
      payload <- validPayload
      cut <- Gen.choose(0, payload.length)
      // word-aligned u32 splat biased to the 2^31..2^32 range the
      // round-10 finding exploited (size.toInt goes negative)
      word <- Gen.choose(0, math.max(0, payload.length / 4 - 1))
      u32 <- Gen.frequency(
        3 -> Gen.choose(0x80000000L, 0xFFFFFFFFL),
        1 -> Gen.choose(0L, 0xFFFFFFFFL))
    } yield {
      val b = payload.take(cut)
      val p = word * 4
      if (p + 4 <= b.length) {
        b(p) = (u32 & 0xFF).toByte
        b(p + 1) = ((u32 >> 8) & 0xFF).toByte
        b(p + 2) = ((u32 >> 16) & 0xFF).toByte
        b(p + 3) = ((u32 >> 24) & 0xFF).toByte
      }
      b
    }
    check("truncate+u32", Prop.forAll(gen)(survives _))
  }
}
