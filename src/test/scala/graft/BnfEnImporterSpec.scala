package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.BnfEnImporter

/** BNF-Europeana importer specs over the reference's sample data. The
  * Gallica ark table (live API in the reference's detect) is supplied
  * as an offline enrichment map. Expected values hand-derived from the
  * sample METS/ALTO files with the reference's algorithm. */
class BnfEnImporterSpec extends AnyFunSuite {

  private val sampleDir =
    "/root/reference/text_preparation/data/sample_data/BNF-EN"
  private val mapper = new ObjectMapper()

  private val arks = Map(
    "legaulois-1882-02-08-a" -> "bpt6k519346g",
    "legaulois-1884-04-30-b" -> "bpt6k520872p",
    "lepji-1900-06-03-a" -> "bpt6k6169427",
    "lematin-1893-04-02-b" -> "bpt6k552435h",
    "jdpl-1821-08-01-a" -> "bpt6k4501141",
    "oecaen-1924-12-18-a" -> "bpt6k4607065",
    "oerennes-1918-12-17-a" -> "bpt6k6468597")

  private lazy val refs = BnfEnImporter.detectIssues(sampleDir, arks)

  test("detect maps journal dirs + date_edition dirs to canonical ids") {
    assert(refs.map(_.issueId).toSet == arks.keySet)
    // second edition: 18840430_02_1 → edition b
    val b = refs.find(_.issueId == "legaulois-1884-04-30-b").get
    assert(b.path.endsWith("18840430_02_1"))
    assert(b.arkLink == "bpt6k520872p")
    // issues absent from the ark table are dropped (reference None filter)
    val partial = BnfEnImporter.detectIssues(sampleDir,
      arks - "jdpl-1821-08-01-a")
    assert(partial.size == refs.size - 1)
  }

  test("Le-PJI 1900-06-03: CI inventory matches the reference algorithm") {
    val parsed = BnfEnImporter.parseIssue(
      refs.find(_.issueId == "lepji-1900-06-03-a").get, "C", "T")
    val issue = mapper.readTree(parsed.issueJson)
    val cis = issue.get("i")
    assert(cis.size == 34)
    def m(i: Int) = cis.get(i).get("m")
    // numbering follows dmdSec lowercased-ID sort
    assert(m(0).get("id").asText == "lepji-1900-06-03-a-i0001")
    assert(cis.get(0).get("l").get("id").asText == "DIVL17")
    assert(m(0).get("ro").asInt == 1)
    // ...ARTICLE10 sorts before ARTICLE2: i0002 is DIVL142 on page 4
    assert(cis.get(1).get("l").get("id").asText == "DIVL142")
    assert(m(1).get("ro").asInt == 9)
    val pp2 = m(1).get("pp")
    assert(pp2.size == 1 && pp2.get(0).asInt == 4)
    // 5 illustrations → type image, with coords + iiif link
    val images = (0 until cis.size).map(m)
      .filter(_.get("tp").asText == "image")
    assert(images.size == 5)
    val labeled = (0 until cis.size)
      .find(i => m(i).get("tp").asText == "image" &&
        m(i).get("t").asText.startsWith("LES ENFANTS")).get
    assert(m(labeled).get("id").asText == "lepji-1900-06-03-a-i0025")
    val c = cis.get(labeled).get("c")
    assert((0 until 4).map(c.get(_).asInt) == Seq(1127, 1649, 1162, 787))
    assert(m(labeled).get("iiif_link").asText ==
      "https://gallica.bnf.fr/iiif/ark:/12148/bpt6k6169427/f6/info.json")
    // issue-level iiif manifest + 8 pages
    assert(issue.get("iiif_manifest_uri").asText ==
      "https://gallica.bnf.fr/iiif/ark:/12148/bpt6k6169427/manifest.json")
    assert(issue.get("pp").size == 8)
    assert(issue.get("st").asText == "newspaper")
  }

  test("Le-Gaulois 1882-02-08: section decompose + table CI") {
    val parsed = BnfEnImporter.parseIssue(
      refs.find(_.issueId == "legaulois-1882-02-08-a").get, "C", "T")
    val issue = mapper.readTree(parsed.issueJson)
    val cis = issue.get("i")
    assert(cis.size == 38)
    val tables = (0 until cis.size).map(cis.get(_).get("m"))
      .filter(_.get("tp").asText == "table")
    assert(tables.size == 1)
    assert(tables.head.get("id").asText == "legaulois-1882-02-08-a-i0024")
    assert(tables.head.get("pp").get(0).asInt == 4)
    // the table's first legacy part is the image-role composed block
    val tci = (0 until cis.size).map(cis.get)
      .find(_.get("m").get("id").asText.endsWith("i0024")).get
    val part0 = tci.get("l").get("parts").get(0)
    assert(part0.get("comp_role").asText == "image")
    assert(part0.get("comp_id").asText == "P4_CB00001")
    assert(part0.get("comp_page_no").asInt == 4)
    // CI languages come from the dmdSec languageTerm
    assert(cis.get(0).get("m").get("lg").asText == "fr")
  }

  test("pages parse with pOf mappings onto the ark iiif base") {
    val parsed = BnfEnImporter.parseIssue(
      refs.find(_.issueId == "lepji-1900-06-03-a").get, "C", "T")
    assert(parsed.pageJsons.size == 8)
    val (pid, pageJson) = parsed.pageJsons.head
    assert(pid == "lepji-1900-06-03-a-p0001")
    val page = mapper.readTree(pageJson)
    assert(page.get("iiif_img_base_uri").asText ==
      "https://gallica.bnf.fr/iiif/ark:/12148/bpt6k6169427/f1")
    assert(page.get("cc").asBoolean)
    val regions = page.get("r")
    assert(regions.size > 0)
    // at least one region is attributed to a CI of this issue
    val pofs = (0 until regions.size).map(regions.get(_).get("pOf"))
      .filter(_ != null).map(_.asText)
    assert(pofs.nonEmpty)
    assert(pofs.forall(_.startsWith("lepji-1900-06-03-a-i")))
    // regions have real token content
    val hasTokens = (0 until regions.size).exists { i =>
      val ps = regions.get(i).get("p")
      ps.size > 0 && ps.get(0).get("l").size > 0
    }
    assert(hasTokens)
  }

  test("every sample issue parses without error; ids deterministic") {
    val all = refs.map(r => BnfEnImporter.parseIssue(r, "C", "T"))
    assert(all.size == 7)
    all.foreach { p =>
      val issue = mapper.readTree(p.issueJson)
      assert(issue.get("i").size > 0, p.issueId)
      assert(p.pageJsons.nonEmpty, p.issueId)
      // reading order is a permutation of 1..n
      val ros = (0 until issue.get("i").size)
        .map(issue.get("i").get(_).get("m").get("ro").asInt).sorted
      assert(ros == (1 to issue.get("i").size), p.issueId)
    }
    // determinism: a second parse yields byte-identical output
    val again = BnfEnImporter.parseIssue(
      refs.find(_.issueId == "lepji-1900-06-03-a").get, "C", "T")
    assert(again.issueJson ==
      all(refs.indexWhere(_.issueId == "lepji-1900-06-03-a")).issueJson)
  }
}
