package graft

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.SwissInfoImporter

/** SwissInfo radio-bulletin importer specs. The reference's sample file
  * is the raw pdfplumber dump (pre-preprocessing), not importer input,
  * so fixtures here synthesize the preprocessed OCR JSON shape
  * (swissinfo_extract_ocr_from_pdfs.py: ocr_pages → blocks_with_lines →
  * lines → spans, rescaled_bbox everywhere). */
class SwissInfoImporterSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def span(tx: String, x1: Int, y1: Int, x2: Int, y2: Int): String =
    s"""{"text":${mapper.writeValueAsString(tx)},"rescaled_bbox":[$x1,$y1,$x2,$y2]}"""

  private def line(bbox: (Int, Int, Int, Int), spans: String*): String =
    s"""{"rescaled_bbox":[${bbox._1},${bbox._2},${bbox._3},${bbox._4}],"spans":[${spans.mkString(",")}]}"""

  private def block(n: Int, bbox: (Int, Int, Int, Int), lines: String*): String =
    s"""{"number":$n,"rescaled_bbox":[${bbox._1},${bbox._2},${bbox._3},${bbox._4}],"lines":[${lines.mkString(",")}]}"""

  /** Build a fixture tree; returns the base dir. */
  private def fixture(blocksPage1: Seq[String], split: Boolean): Path = {
    val base = Files.createTempDirectory("swissinfo")
    val issueDir = base.resolve(
      "WW2-SOC-bulletins-json/SOC_CJ/1945/07/12/a")
    Files.createDirectories(issueDir)
    val issueId = "SOC_CJ-1945-07-12-a"
    val bulletin =
      s"""{"lang":"fr",
         |"original_path":"/local/stuff/pdfs/1945/07/SRI_XY_CJ_19450712_FR.pdf",
         |"jp2_full_paths":["out/jp2/$issueId-p0001.jp2","out/jp2/$issueId-p0002.jp2"],
         |"ocr_pages":[
         |  {"page_num":0,"ocr_page_size":[600,800],"jp2_img_size":[2400,3200],
         |   "blocks_with_lines":[${blocksPage1.mkString(",")}],
         |   "blocks_without_lines":[]},
         |  {"page_num":1,"ocr_page_size":[600,800],"jp2_img_size":[2400,3200],
         |   "blocks_with_lines":[],"blocks_without_lines":[]}
         |]}""".stripMargin
    Files.writeString(issueDir.resolve(s"$issueId.json"), bulletin)
    Files.writeString(
      base.resolve("WW2-SOC-bulletins-json/SOC_rb_metadata.json"),
      """[{"archive_key":"SRI_XY_CJ_19450712_FR","segment_title":"Chronique du jour",
        |"program_title":"Courrier de la Suisse","program_subtitle":"Edition du soir"}]"""
        .stripMargin)
    base
  }

  // 4-line block (mean 4 >= 3.5 → no split), with a cross-line hyphen
  // and a space-only span
  private val richBlocks = Seq(
    block(1, (10, 10, 500, 200),
      line((10, 10, 500, 50), span("Au", 10, 10, 60, 50),
        span(" ", 61, 10, 62, 50), span("re-", 70, 10, 120, 50)),
      line((10, 60, 500, 100), span("voir", 10, 60, 80, 100),
        span("tout", 90, 60, 150, 100)),
      line((10, 110, 500, 150), span("le", 10, 110, 40, 150)),
      line((10, 160, 500, 200), span("monde", 10, 160, 100, 200))))

  test("detect walks the WW2-SOC layout; parse builds issue + pages") {
    val base = fixture(richBlocks, split = false)
    val refs = SwissInfoImporter.detectIssues(base.toString)
    assert(refs.map(_.issueId) == Seq("SOC_CJ-1945-07-12-a"))
    val parsed = SwissInfoImporter.parseIssue(refs.head, "T")
    val issue = mapper.readTree(parsed.issueJson)
    assert(issue.get("st").asText == "radio_bulletin")
    assert(issue.get("sm").asText == "typescript")
    assert(issue.get("rc").asText == "SOC (KWD)")
    // program title + subtitle joined
    assert(issue.get("rp").asText == "Courrier de la Suisse - Edition du soir")
    // single chronicle CI (metadata matched) with both pages
    val m = issue.get("i").get(0).get("m")
    assert(m.get("tp").asText == "chronicle")
    assert(m.get("t").asText == "Chronique du jour")
    assert(m.get("var_t").asText == "Courrier de la Suisse")
    assert(m.get("lg").asText == "fr")
    assert((0 until m.get("pp").size).map(m.get("pp").get(_).asInt) == Seq(1, 2))
    // legacy source: last three path segments of the original pdf
    assert(issue.get("i").get(0).get("l").get("source").asText ==
      "1945/07/SRI_XY_CJ_19450712_FR.pdf")
    // page 2 has no OCR: a note plus an empty-region page
    assert(parsed.pageJsons.map(_._1) ==
      Seq("SOC_CJ-1945-07-12-a-p0001", "SOC_CJ-1945-07-12-a-p0002"))
    val notes = (0 until issue.get("n").size).map(issue.get("n").get(_).asText)
    assert(notes.exists(_.contains("page 2 has no block with lines")))
    val p2 = mapper.readTree(parsed.pageJsons(1)._2)
    assert(p2.get("r").size == 0)
    assert(p2.get("fw").asInt == 2400 && p2.get("fh").asInt == 3200)
  }

  test("page regions aggregate blocks; hyphenation merges across lines") {
    val base = fixture(richBlocks, split = false)
    val parsed = SwissInfoImporter.parseIssue(
      SwissInfoImporter.detectIssues(base.toString).head, "T")
    val p1 = mapper.readTree(parsed.pageJsons.head._2)
    assert(p1.get("st").asText == "radio_bulletin")
    assert(p1.get("cc").asBoolean)
    val r = p1.get("r")
    assert(r.size == 1)
    assert(r.get(0).get("pOf").asText == "SOC_CJ-1945-07-12-a-i0001")
    // region box = enclosing xywh of block bboxes
    val c = (0 until 4).map(r.get(0).get("c").get(_).asInt)
    assert(c == Seq(10, 10, 490, 190))
    // no split: paragraphs == blocks
    val paras = r.get(0).get("p")
    assert(paras.size == 1)
    val lines = paras.get(0).get("l")
    assert(lines.size == 4)
    // space-only span dropped; trailing '-' token flagged hy
    val l1 = lines.get(0).get("t")
    assert(l1.size == 2)
    assert(l1.get(1).get("tx").asText == "re-")
    assert(l1.get(1).get("hy").asBoolean)
    // follower's first token carries the merged normalized form
    val l2 = lines.get(1).get("t")
    assert(l2.get(0).get("tx").asText == "voir")
    assert(l2.get(0).get("nf").asText == "revoir")
    assert(!l2.get(1).has("nf"))
  }

  test("line-split pages merge all block paragraphs into one") {
    // blocks of 1-2 lines → mean < 3.5 → split_page_blocks for ALL pages
    val tiny = Seq(
      block(1, (10, 10, 300, 50),
        line((10, 10, 300, 50), span("un", 10, 10, 50, 50))),
      block(2, (10, 60, 300, 100),
        line((10, 60, 300, 100), span("deux", 10, 60, 80, 100))))
    val base = fixture(tiny, split = true)
    val parsed = SwissInfoImporter.parseIssue(
      SwissInfoImporter.detectIssues(base.toString).head, "T")
    val r = mapper.readTree(parsed.pageJsons.head._2).get("r")
    assert(r.size == 1)
    val paras = r.get(0).get("p")
    // merged: one paragraph holding both blocks' lines, region coords
    assert(paras.size == 1)
    assert(paras.get(0).get("l").size == 2)
    assert(paras.get(0).get("c") == r.get(0).get("c"))
  }

  test("an issue with no OCR in any page is rejected (F7 no-text filter)") {
    val base = fixture(Seq.empty, split = false)
    // page 1 also has empty blocks now → every page missing → reject
    val ex = intercept[IllegalStateException] {
      SwissInfoImporter.parseIssue(
        SwissInfoImporter.detectIssues(base.toString).head, "T")
    }
    assert(ex.getMessage.contains("No OCR in any of the pages"))
  }
}
