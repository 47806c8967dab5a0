package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.BlImporter
import graft.rebuild.RebuildJob

/** BL importer specs: structural checks on the unpacked sample issue
  * (no canonical goldens exist for BL) plus the paper rebuild chain.
  */
class BlImporterSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sampleDir =
    "/root/reference/text_preparation/data/sample_data/BL"
  private val mapper = new ObjectMapper()

  private lazy val refs = BlImporter.detectIssues(sampleDir)
  private lazy val parsed =
    refs.map(r => BlImporter.parseIssue(r, "C", "T"))

  test("detect walks blip/nlp/year/MMDD") {
    assert(refs.map(_.issueId).toSet ==
      Set("0002088-1832-11-23-a", "0002244-1855-09-22-a"))
  }

  test("zip-shaped dump extracts then detects, matching the dir walk") {
    val tmp = java.nio.file.Files.createTempDirectory("bl-zips").toString
    val fromZips = BlImporter.detectIssuesFromZips(sampleDir, tmp)
    val fromDirs = BlImporter.detectIssues(sampleDir)
    assert(fromZips.map(_.issueId).sorted == fromDirs.map(_.issueId).sorted)
    // extracted issues parse identically to the pre-extracted tree
    val z = fromZips.sortBy(_.issueId).head
    val d = fromDirs.sortBy(_.issueId).head
    assert(BlImporter.parseIssue(z, "C", "T").issueJson ==
      BlImporter.parseIssue(d, "C", "T").issueJson)
  }

  test("content items resolve parts through structLink into pages") {
    val issue = mapper.readTree(parsed.head.issueJson)
    val cis = issue.get("i")
    assert(cis.size > 0)
    var withParts = 0
    for (i <- 0 until cis.size) {
      val ci = cis.get(i)
      assert(ci.get("m").get("ro").asInt > 0)
      if (ci.get("l").get("parts").size > 0) withParts += 1
      assert(ci.get("m").get("pp").size > 0)
    }
    assert(withParts > 0, "some CIs have physical parts")
    assert(issue.get("pp").size == parsed.head.pageJsons.size)
  }

  test("pages parse with pOf mappings and feed the rebuild fold") {
    val pages = parsed.head.pageJsons
    assert(pages.nonEmpty)
    val withPof = pages.count { case (_, js) =>
      val r = mapper.readTree(js).get("r")
      (0 until r.size).exists(i => r.get(i).has("pOf"))
    }
    assert(withPof > 0, "regions link to content items")
    import spark.implicits._
    val issues = spark.read.schema(RebuildJob.issueSchema)
      .json(spark.createDataset(Seq(parsed.head.issueJson)))
    val pagesDf = spark.read.schema(RebuildJob.pageSchema)
      .json(spark.createDataset(pages.map(_._2)))
    val rebuilt = RebuildJob.rebuildSolr(spark, issues, pagesDf, "T").collect()
    assert(rebuilt.nonEmpty)
    assert(rebuilt.exists(_.ft.exists(_.length > 100)))
  }
}
