package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ShinglesImpl
import graft.util.Json
import graft.util.Json._

/** Property-based checks over the pure-JVM kernels the distributed
  * operators rely on — randomized inputs catch the edge cases example
  * tests miss (empty tokens, unicode, whitespace runs, boundary k). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("shingles = sliding word windows, count max(n-k+1, 1), any tokens") {
    check("shingles", Prop.forAll(
      Gen.nonEmptyListOf(token), Gen.choose(1, 6)) { (toks, k) =>
      val text = toks.mkString(" ")
      val got = ShinglesImpl.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
        .array.map(_.toString).toSeq
      val expected =
        if (toks.length <= k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      got == expected && got.length == math.max(toks.length - k + 1, 1)
    })
  }

  test("shingles are invariant to inter-token whitespace and outer spaces") {
    // tabs/newlines/runs of spaces BETWEEN tokens must not change the
    // shingle set (tokens are split(trim(text), \s+)); leading and
    // trailing SPACES are trimmed. Outer \t/\n deliberately are NOT —
    // trim strips ASCII spaces only, identically in Spark, DuckDB and
    // the native expression, so a trailing newline yields an empty
    // trailing token on every engine alike.
    val ws = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString)
    check("ws-invariant", Prop.forAll(
      Gen.nonEmptyListOf(token), ws, Gen.choose(1, 4)) { (toks, sep, k) =>
      def sh(t: String) = ShinglesImpl.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), k)
        .array.map(_.toString).toSeq
      sh(toks.mkString(sep)) == sh(toks.mkString(" ")) &&
        sh(s"  ${toks.mkString(" ")}  ") == sh(toks.mkString(" "))
    })
  }

  test("minhash seeds stay within the field and signatures are order-free") {
    check("seeds", Prop.forAll(Gen.choose(0, 4096)) { i =>
      val (a, b) = graft.operators.Dedup.minhashSeeds(i)
      a >= 0 && a < graft.operators.Dedup.MinhashP &&
        b >= 0 && b < graft.operators.Dedup.MinhashP
    })
  }

  test("editionLetter is injective over realistic edition counts") {
    val letters = (0 until 200).map(graft.functions.Ids.editionLetter)
    assert(letters.distinct.length == letters.length)
    assert(graft.functions.Ids.editionLetter(0) == "a")
  }

  test("AVI codec round-trips header and every frame's pixel sums for any id") {
    check("avi", Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      import graft.operators.AviCodec
      val bytes = AviCodec.encodeSyntheticAvi(id)
      val (w, h, nf, usPf) = AviCodec.syntheticParams(id)
      val metaOk = AviCodec.decodeMeta(bytes).contains((w, h, nf, usPf))
      val frames = AviCodec.frameStats(bytes).getOrElse(Nil)
      val framesOk = frames.length == nf && frames.forall {
        case (f, fw, fh, rs, gs, bs) =>
          var er = 0L; var eg = 0L; var eb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = AviCodec.pixel(id, f, x, y)
              er += r; eg += g; eb += b
              x += 1
            }
            y += 1
          }
          (fw, fh, rs, gs, bs) == ((w, h, er, eg, eb))
      }
      metaOk && framesOk
    })
  }

  test("gallica edition lettering: runs of same-day issues letter a, b, c…") {
    import graft.enrich.{Enrich, GallicaArks}
    // one year, a random non-decreasing dayofyear list → expected
    // letters are per-run ranks in order
    val days: Gen[List[Int]] = Gen.nonEmptyListOf(Gen.choose(1, 365))
      .map(_.sorted.take(20))
    check("editions", Prop.forAll(days) { ds =>
      val issuesXml = ds.zipWithIndex.map { case (d, i) =>
        s"""<issue ark="a$i" dayofyear="$d">jour $d</issue>"""
      }.mkString("<issues>", "", "</issues>")
      val mock: Enrich.Http = {
        case u if u.contains("date&date=") => issuesXml
        case _ => "<issues><year>1901</year></issues>"
      }
      val links = GallicaArks.issueArks(mock, "j", "ark:x")
      val expectedLetters = ds.groupBy(identity).toSeq.sortBy(_._1)
        .flatMap { case (_, run) => run.indices.map(i => ('a' + i).toChar) }
      links.length == ds.length &&
        links.map(_._1.last) == expectedLetters &&
        links.map(_._1).distinct.length == links.length // ids unique
    })
  }

  test("Json.render escapes arbitrary strings into Jackson-parseable JSON") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    check("json", Prop.forAll { (s: String, key: String) =>
      val rendered = Json.render(JObj(Seq(
        "k" -> JStr(s), "arr" -> Json.strs(Seq(key, s)))))
      val node = mapper.readTree(rendered)
      node.get("k").asText == s && node.get("arr").get(1).asText == s
    })
  }

  // text drawn from the char families the ascii-scan kernels classify:
  // letters both cases, digits, every Java \s char, ASCII punctuation,
  // and a couple of non-ASCII code points (1 symbol each to the scans)
  private val scanText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaChar, 2 -> Gen.numChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
    2 -> Gen.oneOf('.', ',', '!', '@', '#', '-', '_', '(', ')'),
    1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)

  test("ascii_keep_lower == regexp_replace(lower, [^a-z0-9 ], '') for any text") {
    val re = java.util.regex.Pattern.compile("[^a-z0-9 ]")
    check("asciiKeep", Prop.forAll(scanText) { s =>
      val got = graft.functions.AsciiScanImpl.keepLowerAlnumSpace(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      got == re.matcher(s.toLowerCase(java.util.Locale.ROOT)).replaceAll("")
    })
  }

  test("bpe_token_count == regex alternation count for any text") {
    val re = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    check("bpeCount", Prop.forAll(scanText) { s =>
      val got = graft.functions.AsciiScanImpl.bpeTokenCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val m = re.matcher(s.toLowerCase(java.util.Locale.ROOT))
      var n = 0
      while (m.find()) n += 1
      got == n
    })
  }

  test("vowel_run_count == [aeiouy]+ match count over lower(text)") {
    val re = java.util.regex.Pattern.compile("[aeiouy]+")
    check("vowelRuns", Prop.forAll(scanText) { s =>
      val got = graft.functions.AsciiScanImpl.vowelRunCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val m = re.matcher(s.toLowerCase(java.util.Locale.ROOT))
      var n = 0
      while (m.find()) n += 1
      got == n
    })
  }

  test("sentence_run_count == [.!?]+ match count for any text") {
    val re = java.util.regex.Pattern.compile("[.!?]+")
    check("sentenceRuns", Prop.forAll(scanText) { s =>
      val got = graft.functions.AsciiScanImpl.sentenceRunCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val m = re.matcher(s)
      var n = 0
      while (m.find()) n += 1
      got == n
    })
  }

  /** Reference winnowing straight from the definition: hash every
    * k-gram (60-bit md5 prefix), take the min of every full w-window
    * (truncated single window when there are fewer positions than w),
    * distinct — the formulation the d12 DuckDB oracle replays with a
    * window function. The native impl uses a monotonic deque; this
    * property is the deque's correctness proof. */
  private def refWinnow(s: String, k: Int, w: Int): Set[Long] = {
    val cps = {
      val b = Seq.newBuilder[Int]
      var i = 0
      while (i < s.length) {
        b += i; i += Character.charCount(s.codePointAt(i))
      }
      (b += s.length).result()
    }
    val nCp = cps.length - 1
    val npos = math.max(nCp - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until npos).map { i =>
      val g = s.substring(cps(i), cps(math.min(i + k, nCp)))
      val hex = md.digest(g.getBytes("UTF-8"))
        .map(b => f"${b & 0xFF}%02x").mkString
      md.reset()
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    (0 until math.max(npos - w + 1, 1)).map(j =>
      hs.slice(j, math.min(j + w, npos)).min).toSet
  }

  test("native winnow == definitional slice-min winnow for any text/k/w") {
    check("winnow", Prop.forAll(
      scanText, Gen.choose(2, 12), Gen.choose(2, 8)) { (s, k, w) =>
      val got = graft.functions.WinnowImpl.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        .array.map(_.asInstanceOf[Long]).toSet
      got == refWinnow(s, k, w)
    })
  }

  // dHash64 properties over random greyscale rasters (m8's kernel)

  private def grey(vals: Array[Array[Int]]): java.awt.image.BufferedImage = {
    val h = vals.length; val w = vals(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = vals(y)(x); img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    img
  }

  private val raster: Gen[Array[Array[Int]]] = for {
    w <- Gen.choose(9, 40); h <- Gen.choose(8, 40)
    vs <- Gen.listOfN(w * h, Gen.choose(0, 200))
  } yield vs.grouped(w).map(_.toArray).toArray

  test("dHash64 is invariant under uniform brightness shifts (no clipping)") {
    check("dhash-shift", Prop.forAll(raster, Gen.choose(1, 55)) { (vs, c) =>
      val shifted = vs.map(_.map(_ + c)) // 0..200 + <=55 stays in range
      graft.operators.ImageCodec.dHash64(grey(vs)) ==
        graft.operators.ImageCodec.dHash64(grey(shifted))
    })
  }

  test("dHash64 == definitional grid comparison for any raster") {
    check("dhash-def", Prop.forAll(raster) { vs =>
      val h = vs.length; val w = vs(0).length
      var expect = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val y = j * h / 8
        if (vs(y)((i + 1) * w / 9) > vs(y)(i * w / 9))
          expect |= 1L << (j * 8 + i)
      }
      graft.operators.ImageCodec.dHash64(grey(vs)) == expect
    })
  }

  test("tar parse ∘ archive is the identity for any entry sequence") {
    import graft.sources.TarShards
    val entry: Gen[(String, Array[Byte])] = for {
      name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(40).mkString)
      n <- Gen.oneOf(Gen.choose(0, 20), Gen.choose(500, 1200))
      data <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (name, data.toArray)
    check("tar-roundtrip", Prop.forAll(Gen.listOf(entry)) { entries =>
      val baos = new java.io.ByteArrayOutputStream()
      entries.foreach { case (name, data) =>
        baos.write(TarShards.header(name, data.length.toLong))
        baos.write(data)
        baos.write(new Array[Byte]((512 - data.length % 512) % 512))
      }
      baos.write(new Array[Byte](1024))
      val got = TarShards.parse(baos.toByteArray)
      got.map(_._1) == entries.map(_._1) &&
        got.map(_._2.toSeq) == entries.map(_._2.toSeq)
    })
  }

  test("charBigrams covers text with max(len-1, 1) overlapping grams") {
    check("charBigrams", Prop.forAll(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val spark = SparkTestSession.spark
      import spark.implicits._
      val got = Seq(s).toDF("t")
        .select(graft.operators.Curation.charBigrams(
          org.apache.spark.sql.functions.col("t")))
        .collect()(0).getSeq[String](0)
      val expect =
        if (s.length < 2) Seq(s) else s.sliding(2).toSeq
      got == expect
    })
  }

  test("char_bigram_counts == occurrence counts of the definitional bigrams, any text") {
    // include multi-byte chars: the native pass walks code points
    // exactly like substr
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('é')), (1, Gen.const('末')))
    check("charBigramCounts", Prop.forAll(
      Gen.listOf(charGen).map(_.mkString)) { s =>
      val spark = SparkTestSession.spark
      import spark.implicits._
      graft.functions.CharLmImpl.register(spark)
      val got = Seq(s).toDF("t")
        .selectExpr("char_bigram_counts(t) AS m")
        .collect()(0).getMap[String, Long](0)
      val grams = if (s.length < 2) Seq(s) else s.sliding(2).toSeq
      val expect = grams.groupBy(identity).map { case (g, o) =>
        g -> o.size.toLong }
      got.toMap == expect
    })
  }
}
