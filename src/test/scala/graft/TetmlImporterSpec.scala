package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.TetmlImporter
import graft.rebuild.RebuildJob

/** TETML importer specs: structure checks on the FedGazDe sample (no
  * canonical goldens for TETML) plus the rebuild chain with TET
  * dehyphenation flowing through to the fulltext fold.
  */
class TetmlImporterSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sampleDir =
    "/root/reference/text_preparation/data/sample_data/Tetml"
  private val mapper = new ObjectMapper()

  private lazy val refs = TetmlImporter.detectIssues(sampleDir)
  private lazy val parsed = Seq(TetmlImporter.parseIssue(
    refs.find(_.issueId == "FedGazDe-1857-09-26-a").get, "C", "T"))

  test("detect finds the FedGazDe sample issue with its articles") {
    assert(refs.size == 23)
    assert(refs.exists(_.issueId == "FedGazDe-1857-09-26-a"))
    val issue = mapper.readTree(parsed.head.issueJson)
    assert(issue.get("i").size == 5)
    // articles span consecutive page ranges
    val pps = (0 until issue.get("i").size).map { i =>
      val pp = issue.get("i").get(i).get("m").get("pp")
      (0 until pp.size).map(pp.get(_).asInt)
    }
    assert(pps.flatten == (1 to pps.flatten.size))
    // language under the deprecated m.l key, faithful to the reference
    assert(issue.get("i").get(0).get("m").get("l").asText == "de")
  }

  test("word-level parse produces hyphenation pairs and glue flags") {
    var hy, nf, gn = 0
    for ((_, js) <- parsed.head.pageJsons) {
      val r = mapper.readTree(js).get("r")
      for (i <- 0 until r.size; p <- 0 until r.get(i).get("p").size) {
        val ls = r.get(i).get("p").get(p).get("l")
        for (l <- 0 until ls.size) {
          val ts = ls.get(l).get("t")
          for (t <- 0 until ts.size) {
            if (ts.get(t).has("hy")) hy += 1
            if (ts.get(t).has("nf")) nf += 1
            if (ts.get(t).has("gn")) gn += 1
          }
        }
      }
    }
    assert(hy > 0, "hyphenated first halves present")
    assert(nf > 0, "normalized forms on continuation tokens")
    assert(gn > 0, "glue flags from de whitespace rules")
  }

  test("output feeds the paper rebuild with dehyphenated fulltext") {
    import spark.implicits._
    val issues = spark.read.schema(RebuildJob.issueSchema)
      .json(spark.createDataset(Seq(parsed.head.issueJson)))
    val pages = spark.read.schema(RebuildJob.pageSchema)
      .json(spark.createDataset(parsed.head.pageJsons.map(_._2)))
    val rebuilt = RebuildJob.rebuildSolr(spark, issues, pages, "T").collect()
    assert(rebuilt.length == 5)
    rebuilt.foreach { ci =>
      assert(ci.ft.exists(_.length > 100), s"${ci.id}")
      // dehyphenation: the fold must drop hy halves and use nf forms, so
      // no token span may extend past the fulltext
      val ft = ci.ft.get
      ci.ppreb.get.flatMap(_.t).filter(_.hy1.isEmpty).foreach { t =>
        assert(t.s + t.l <= ft.length)
      }
    }
  }
}
