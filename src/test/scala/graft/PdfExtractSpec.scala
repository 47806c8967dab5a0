package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.SwissInfoPdfExtract
import graft.parse.{Pdf, SwissInfoImporter}

/** Pure-JVM PDF text extraction + the SwissInfo PDF→OCR-JSON
  * pre-extraction job, end-to-end into the SwissInfo importer —
  * closing the raw-PDF input gap (reference preprocessing script
  * swissinfo_extract_ocr_from_pdfs.py). */
class PdfExtractSpec extends AnyFunSuite {
  import SparkTestSession._

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }

  /** A two-page fixture: page 1 uncompressed (Tm, Td, TD paths),
    * page 2 FlateDecode (TL + T*, TJ array, escapes). */
  private def fixturePdf(): Array[Byte] = {
    val c1 =
      """BT /F1 12 Tf 1 0 0 1 50 700 Tm (Hello world) Tj ET
        |BT /F1 10 Tf 50 600 Td (Second block line one) Tj 0 -14 TD (and line two) Tj ET
        |""".stripMargin
    val c2 =
      """BT /F1 9 Tf 12 TL 1 0 0 1 40 800 Tm (Page deux) Tj T* (ligne suivante) Tj ET
        |BT /F1 9 Tf 1 0 0 1 40 400 Tm [(Kerned) -120 ( arr\(a\)y)] TJ ET
        |""".stripMargin
    val c2z = deflate(c2)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 " +
      "/MediaBox [0 0 610.08 849.36] >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n")
    w(c1)
    w("endstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2z.length} /Filter /FlateDecode >> stream\n")
    out.write(c2z)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("Pdf.extract: pages, blocks, lines, spans, top-down boxes") {
    val pages = Pdf.extract(fixturePdf())
    assert(pages.length == 2)
    val p1 = pages.head
    assert(math.abs(p1.width - 610.08) < 1e-9)
    assert(math.abs(p1.height - 849.36) < 1e-9)
    assert(p1.blocks.length == 2)
    val s1 = p1.blocks(0).lines(0).spans(0)
    assert(s1.text == "Hello world")
    // Tm placed the pen at (50, 700) bottom-up, 12pt font →
    // top-down box (50, H-712, 50+0.5·12·11, H-700)
    assert(math.abs(s1.bbox(0) - 50) < 1e-9)
    assert(math.abs(s1.bbox(1) - (849.36 - 712)) < 1e-9)
    assert(math.abs(s1.bbox(2) - (50 + 66)) < 1e-9)
    assert(math.abs(s1.bbox(3) - (849.36 - 700)) < 1e-9)
    // second block: Td then TD newline — two lines, descending top
    val b2 = p1.blocks(1)
    assert(b2.lines.map(_.spans.map(_.text).mkString) ==
      Seq("Second block line one", "and line two"))
    assert(b2.lines(0).bbox(1) < b2.lines(1).bbox(1))
    // page 2 decoded through Flate: T* advances by the TL leading,
    // the TJ array concatenates its strings, escapes unescaped
    val p2 = pages(1)
    assert(p2.blocks(0).lines.map(_.spans.map(_.text).mkString) ==
      Seq("Page deux", "ligne suivante"))
    assert(p2.blocks(1).lines(0).spans.map(_.text) ==
      Seq("Kerned", " arr(a)y"))
  }

  test("multi-digit indirect /Length falls through to the endstream scan") {
    // `/Length 100 0 R` must NOT partial-match as a direct length of
    // 10 (the old lookahead let the regex retreat to the '10' prefix,
    // mis-slicing the stream); the whole content must survive
    val c1 = "BT /F1 12 Tf 1 0 0 1 50 700 Tm " +
      "(A line far longer than ten bytes so a prefix-sliced stream " +
      "would lose it) Tj ET\n"
    assert(c1.length > 100)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w("4 0 obj << /Length 100 0 R >> stream\n")
    w(c1)
    w("endstream endobj\n")
    w(s"100 0 obj ${c1.length} endobj\n")
    w("%%EOF\n")
    val pages = Pdf.extract(out.toByteArray)
    assert(pages.length == 1)
    val txt = pages.head.blocks.flatMap(_.lines)
      .flatMap(_.spans).map(_.text).mkString(" ")
    assert(txt.contains("would lose it"), txt)
  }

  test("objects packed in a /ObjStm object stream resolve (modern layout)") {
    // catalog + pages + page dict live INSIDE a Flate-compressed
    // object stream; only the content stream is a regular object
    val c1 = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (Packed hello) Tj ET\n"
    val inner =
      "<< /Type /Catalog /Pages 2 0 R >>\n" +
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>\n" +
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>\n"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >>\n"
    val header = s"1 0 2 ${o1.length} 3 ${o1.length + o2.length} "
    val body = header + inner
    val z = deflate(body)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"5 0 obj << /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${z.length} /Filter /FlateDecode >> stream\n")
    out.write(z)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n")
    w(c1)
    w("endstream endobj\n%%EOF\n")
    val pages = Pdf.extract(out.toByteArray)
    assert(pages.length == 1, pages.toString)
    assert(pages.head.blocks.head.lines.head.spans.head.text ==
      "Packed hello")
    assert(math.abs(pages.head.width - 612.0) < 1e-9)
  }

  test("canonicalPath ports the filename convention, edition letter intent") {
    assert(SwissInfoPdfExtract.canonicalPath("SRI_XY_CJ_19450712_FR.pdf") ==
      ("SOC_CJ/1945/07/12/a", "fr"))
    assert(SwissInfoPdfExtract.canonicalPath("SRI_XY_KWD_19440101_DE_2.pdf") ==
      ("SOC_KWD/1944/01/01/b", "de"))
    intercept[IllegalArgumentException] {
      SwissInfoPdfExtract.canonicalPath("nonsense.pdf")
    }
  }

  test("PDF → OCR-JSON → SwissInfo importer, end to end") {
    val in = java.nio.file.Files.createTempDirectory("soc-pdfs")
    java.nio.file.Files.write(
      in.resolve("SRI_XY_CJ_19450712_FR.pdf"), fixturePdf())
    val out = java.nio.file.Files.createTempDirectory("soc-json").toString
    val summary = SwissInfoPdfExtract.run(spark, in.toString, out)
      .collect()
    assert(summary.length == 1)
    assert(summary.head.getString(0) == "SOC_CJ-1945-07-12-a")
    assert(summary.head.getInt(1) == 2)
    assert(summary.head.isNullAt(2))
    // the written tree is exactly what the importer detects and parses
    val refs = SwissInfoImporter.detectIssues(out)
    assert(refs.length == 1)
    assert(refs.head.issueId == "SOC_CJ-1945-07-12-a")
    val parsed = SwissInfoImporter.parseIssue(refs.head,
      "2020-01-01 00:00:00")
    assert(parsed.issueId == "SOC_CJ-1945-07-12-a")
    assert(parsed.pageJsons.map(_._1) == Seq(
      "SOC_CJ-1945-07-12-a-p0001", "SOC_CJ-1945-07-12-a-p0002"))
    assert(parsed.pageJsons(0)._2.contains("Hello"))
    assert(parsed.pageJsons(0)._2.contains("Second"))
    assert(parsed.pageJsons(1)._2.contains("deux"))
    assert(parsed.issueJson.contains("\"lg\":\"fr\"") ||
      parsed.issueJson.contains("\"lg\": \"fr\"") ||
      parsed.issueJson.contains("fr"))
    // a malformed PDF quarantines as an error row, never a failure
    java.nio.file.Files.write(in.resolve("SRI_XY_CJ_19450713_FR.pdf"),
      "not a pdf at all".getBytes("ISO-8859-1"))
    val summary2 = SwissInfoPdfExtract.run(spark, in.toString, out)
      .collect().sortBy(_.getString(0))
    assert(summary2.length == 2)
    val bad = summary2.find(_.getString(0).contains("19450713")).get
    assert(!bad.isNullAt(2) && bad.getString(2).contains("parseable"))
  }
}
