package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.OnbImporter

class OnbImporterSpec extends AnyFunSuite {

  private val sampleDir =
    "/root/reference/text_preparation/data/sample_data/ONB"
  private val mapper = new ObjectMapper()

  test("detect handles the sample's ANNOP issue-number layout") {
    val refs = OnbImporter.detectIssues(sampleDir)
    assert(refs.nonEmpty)
    assert(refs.forall(_.alias == "esj"))
    assert(refs.map(_.issueId).distinct.size == refs.size)
  }

  test("pages parse as ALTO with page==CI and variant files deduplicated") {
    val refs = OnbImporter.detectIssues(sampleDir)
    val p = OnbImporter.parseIssue(refs.head, "C", "T")
    val issue = mapper.readTree(p.issueJson)
    assert(issue.get("i").size == p.pageJsons.size)
    assert(p.pageJsons.map(_._1).distinct.size == p.pageJsons.size)
    val anyTokens = p.pageJsons.exists { case (_, js) =>
      val r = mapper.readTree(js).get("r")
      r.size > 0 && r.get(0).get("p").get(0).get("l").size > 0
    }
    assert(anyTokens, "ALTO regions with text lines parsed")
  }
}
