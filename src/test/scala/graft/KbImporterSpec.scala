package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.KbImporter

/** KB (Delpher DIDL/ALTO) importer specs — beyond-reference coverage:
  * the reference ships this sample data without an importer. Expected
  * values hand-derived from the didl.xml files. */
class KbImporterSpec extends AnyFunSuite {

  private val sampleDir =
    "/root/reference/text_preparation/data/sample_data/KB"
  private val mapper = new ObjectMapper()

  private lazy val refs = KbImporter.detectIssues(sampleDir)

  test("detect walks newspaper/YYYY/MM/DD/DDD_*_mpeg21 with PPN aliases") {
    assert(refs.map(_.issueId) == Seq(
      "kb832337900-1876-12-01-a",
      "kb832924342-1750-05-15-a",
      "kb852886098-1813-11-16-a"))
  }

  test("1813 issue: 4 articles, zones spanning pages, types and titles") {
    val parsed = KbImporter.parseIssue(
      refs.find(_.issueId == "kb852886098-1813-11-16-a").get, "C", "T")
    val issue = mapper.readTree(parsed.issueJson)
    val cis = issue.get("i")
    assert(cis.size == 4)
    def m(i: Int) = cis.get(i).get("m")
    // a0002 appears in zones of p001 AND p002 → pp [1, 2]
    val pp2 = m(1).get("pp")
    assert((0 until pp2.size).map(pp2.get(_).asInt) == Seq(1, 2))
    assert(m(0).get("t").asText.startsWith("De Notaris HARM JAN VAN BOLHUIS"))
    // subjects: artikel → article, advertentie → advertisement
    val tps = (0 until 4).map(m(_).get("tp").asText).toSet
    assert(tps.subsetOf(Set("article", "advertisement")))
    assert(m(0).get("lg").asText == "fr") // first dc:language of the DIDL
    // legacy keeps the DIDL record id + articletext source
    assert(cis.get(0).get("l").get("id").asText == "ddd:010179815:mpeg21:a0001")
    assert(cis.get(0).get("l").get("source").asText ==
      "DDD_010179815_0001_articletext.xml")
    // reading order is a permutation of 1..4
    assert((0 until 4).map(m(_).get("ro").asInt).sorted == (1 to 4))
    // two pages with resolver iiif bases
    assert(parsed.pageJsons.map(_._1) ==
      Seq("kb852886098-1813-11-16-a-p0001", "kb852886098-1813-11-16-a-p0002"))
    val p1 = mapper.readTree(parsed.pageJsons.head._2)
    assert(p1.get("iiif_img_base_uri").asText ==
      "https://resolver.kb.nl/resolve?urn=ddd:010179815:mpeg21:p001:image")
  }

  test("geometric zoning attributes ALTO blocks to article CIs") {
    val parsed = KbImporter.parseIssue(
      refs.find(_.issueId == "kb852886098-1813-11-16-a").get, "C", "T")
    val p1 = mapper.readTree(parsed.pageJsons.head._2)
    val regions = p1.get("r")
    assert(regions.size > 0)
    val pofs = (0 until regions.size).map(regions.get(_).get("pOf"))
      .filter(_ != null).map(_.asText)
    // page 1 hosts articles a0001 and a0002
    assert(pofs.toSet.subsetOf(Set(
      "kb852886098-1813-11-16-a-i0001", "kb852886098-1813-11-16-a-i0002")))
    assert(pofs.toSet.size == 2)
    // tokens parsed with coordinates
    val hasTokens = (0 until regions.size).exists { i =>
      val ps = regions.get(i).get("p")
      ps.size > 0 && ps.get(0).get("l").size > 0 &&
        ps.get(0).get("l").get(0).get("t").size > 0
    }
    assert(hasTokens)
  }

  test("all three sample issues parse; 1876 has death notices") {
    val all = refs.map(r => KbImporter.parseIssue(r, "C", "T"))
    assert(all.size == 3)
    val big = mapper.readTree(all.map(_.issueJson)
      .find(_.contains("kb832337900")).get)
    assert(big.get("i").size == 77)
    val tps = (0 until 77).map(big.get("i").get(_).get("m").get("tp").asText)
    // familiebericht → death_notice (the reference's open TODO)
    assert(tps.contains("death_notice"))
    assert(big.get("pp").size == 8)
    val sixteen = mapper.readTree(all.map(_.issueJson)
      .find(_.contains("kb832924342")).get)
    assert(sixteen.get("i").size == 16)
  }
}
