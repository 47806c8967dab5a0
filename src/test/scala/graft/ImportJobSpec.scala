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
