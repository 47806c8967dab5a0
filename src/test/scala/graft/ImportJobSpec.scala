package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.ImportJob
import graft.parse.{BnfEnImporter, KbImporter}

/** Generic import job: any (detect, parse) pair runs distributed with
  * quarantine + partitioned bz2 output. Driven here with the KB and
  * BNF-EN importers (the formats without dedicated round-1 jobs). */
class ImportJobSpec extends AnyFunSuite {
  import SparkTestSession._

  test("KB import runs distributed; output reads back partitioned") {
    val refs = KbImporter.detectIssues(
      "/root/reference/text_preparation/data/sample_data/KB")
    val results = ImportJob.run[KbImporter.IssueRef](spark, refs,
      _.issueId,
      r => { val p = KbImporter.parseIssue(r, "C", "T")
        (p.issueId, p.issueJson, p.pageJsons) })
    assert(results.count() == 3)
    assert(ImportJob.quarantine(results).count() == 0)
    val out = java.nio.file.Files.createTempDirectory("kb-out").toString
    ImportJob.write(results, out)
    // issues read back via the declared rebuild schema, one per record
    val issues = graft.rebuild.RebuildJob.readIssues(spark,
      s"$out/issues/alias=kb852886098/year=1813")
    assert(issues.count() == 1)
    assert(issues.select(size(col("i"))).head().getInt(0) == 4)
    val pages = spark.read.text(s"$out/pages/alias=kb852886098/year=1813")
    assert(pages.count() == 2)
  }

  test("a corrupt issue quarantines without failing the job") {
    val refs = KbImporter.detectIssues(
      "/root/reference/text_preparation/data/sample_data/KB") :+
      KbImporter.IssueRef("kbX", "1900-01-01", "a", "/nonexistent/path")
    val results = ImportJob.run[KbImporter.IssueRef](spark, refs,
      _.issueId,
      r => { val p = KbImporter.parseIssue(r, "C", "T")
        (p.issueId, p.issueJson, p.pageJsons) })
    assert(results.count() == 4)
    val q = ImportJob.quarantine(results).collect()
    assert(q.length == 1 && q.head.getString(0) == "kbX-1900-01-01-a")
  }

  test("write-time validation quarantines malformed documents") {
    import spark.implicits._
    val goodIssue = """{"id":"kbx-1900-01-01-a","cdt":"2020-01-01 00:00:00",""" +
      """"pp":["kbx-1900-01-01-a-p0001"],""" +
      """"i":[{"m":{"id":"kbx-1900-01-01-a-i0001","tp":"article","pp":[1]}}]}"""
    val goodPage = """{"id":"kbx-1900-01-01-a-p0001","cc":true,"r":[]}"""
    // missing cdt, CI id of ANOTHER issue, CI pp pointing past the page list
    val badIssue = """{"id":"kbx-1900-01-02-a",""" +
      """"pp":["kbx-1900-01-02-a-p0001"],""" +
      """"i":[{"m":{"id":"other-1900-01-02-a-i0001","tp":"article","pp":[2]}}]}"""
    // token coords must be 4 ints
    val badPage = """{"id":"kbx-1900-01-02-a-p0001","cc":true,""" +
      """"r":[{"c":[1,2,3,4],"pOf":"kbx-1900-01-02-a-i0001",""" +
      """"p":[{"l":[{"t":[{"c":[1,2,3],"tx":"x"}]}]}]}]}"""
    val results = spark.createDataset(Seq(
      ImportJob.ImportResult("kbx-1900-01-01-a", Some(goodIssue),
        Seq(("kbx-1900-01-01-a-p0001", goodPage)), None),
      ImportJob.ImportResult("kbx-1900-01-02-a", Some(badIssue),
        Seq(("kbx-1900-01-02-a-p0001", badPage)), None)))
    val out = java.nio.file.Files.createTempDirectory("val-out").toString
    ImportJob.write(results, out)
    val failed = spark.read.json(s"$out/failed").collect()
    assert(failed.length == 2, failed.mkString("\n"))
    val issueViols = failed.find(_.getAs[String]("doc_id") == "kbx-1900-01-02-a")
      .get.getAs[scala.collection.Seq[String]]("violations")
    assert(issueViols.contains("missing_cdt"))
    assert(issueViols.contains("ci_id_not_of_issue"))
    assert(issueViols.contains("ci_pp_not_in_issue"))
    val pageViols = failed.find(_.getAs[String]("doc_id") == "kbx-1900-01-02-a-p0001")
      .get.getAs[scala.collection.Seq[String]]("violations")
    assert(pageViols.contains("bad_token_coords"))
    // the valid issue+page are written; the invalid ones are excluded
    val issues = spark.read.text(s"$out/issues").collect().map(_.getString(0))
    assert(issues.length == 1 && issues.head.contains("kbx-1900-01-01-a"))
    val pages = spark.read.text(s"$out/pages").collect().map(_.getString(0))
    assert(pages.length == 1 && pages.head.contains("-p0001"))
  }

  test("BNF-EN runs through the same generic job") {
    val refs = BnfEnImporter.detectIssues(
      "/root/reference/text_preparation/data/sample_data/BNF-EN",
      Map("lepji-1900-06-03-a" -> "bpt6k6169427"))
    val results = ImportJob.run[BnfEnImporter.IssueRef](spark, refs,
      _.issueId,
      r => { val p = BnfEnImporter.parseIssue(r, "C", "T")
        (p.issueId, p.issueJson, p.pageJsons) })
    assert(results.count() == 1)
    assert(results.head().pages.size == 8)
  }
}
