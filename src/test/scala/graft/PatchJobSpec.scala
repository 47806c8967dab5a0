package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.PatchJob
import graft.rebuild.RebuildJob

class PatchJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private val canonicalDir =
    "/root/reference/text_preparation/data/out/canonical_out"

  test("patchAddReadingOrder stamps get_reading_order ranks") {
    import spark.implicits._
    // issue with CIs out of page order: i0001 on p2, i0002 on p1,
    // i0003 spanning p1-p2 → ro: i0002=1, i0003=2, i0001=3
    val issues = Seq(
      ("X-1900-01-01-a", Seq(
        (("X-1900-01-01-a-i0001", Seq(2)), 0),
        (("X-1900-01-01-a-i0002", Seq(1)), 0),
        (("X-1900-01-01-a-i0003", Seq(1, 2)), 0))))
      .toDF("id", "raw")
      .withColumn("i", transform(col("raw"), r => struct(struct(
        r.getField("_1").getField("_1").as("id"),
        r.getField("_1").getField("_2").as("pp"),
        lit(null).cast("int").as("ro")).as("m"))))
      .drop("raw")
    val patched = PatchJob.patchAddReadingOrder(issues)
      .select(explode(col("i")).as("ci"))
      .select(col("ci.m.id"), col("ci.m.ro")).as[(String, Int)]
      .collect().toMap
    assert(patched == Map(
      "X-1900-01-01-a-i0001" -> 3,
      "X-1900-01-01-a-i0002" -> 1,
      "X-1900-01-01-a-i0003" -> 2))
  }

  test("patchPageIiifBase rewrites page iiif bases to the proxy") {
    val pages = RebuildJob.readPages(spark,
        s"$canonicalDir/pages/LLE-1946-09-02-a-pages.jsonl.bz2")
      .select(col("id"))
    val patched = PatchJob.patchPageIiifBase(pages,
      "https://impresso-project.ch/api/proxy/iiif/")
    val row = patched.orderBy(col("id")).head()
    assert(row.getString(1) ==
      s"https://impresso-project.ch/api/proxy/iiif/${row.getString(0)}")
  }

  test("manifest write produces per-title JSON that reads back") {
    val stats = graft.operators.Stats.canonicalStats(
      graft.queries.RebuildQueries.syntheticIssues(spark, sf))
    val out = java.nio.file.Files.createTempDirectory("manifest").toString
    graft.operators.Manifest.write(stats, out)
    val back = spark.read.json(s"$out/alias=D0")
    assert(back.count() == 1)
    val row = back.head()
    assert(row.schema.fieldNames.contains("media_stats"))
    assert(row.schema.fieldNames.contains("total_n_issues"))
    // yearly rows nest sorted by year (access by name: JSON read-back
    // re-orders struct fields alphabetically)
    val years = row.getSeq[org.apache.spark.sql.Row](
      row.fieldIndex("media_stats"))
      .map(r => r.getLong(r.fieldIndex("year")))
    assert(years == years.sorted && years.nonEmpty)
  }

  test("patchContentItems applies a generic nested fix") {
    import spark.implicits._
    val issues = Seq(("A-1900-01-01-a", Seq("x"))).toDF("id", "raw")
      .withColumn("i", transform(col("raw"),
        _ => struct(struct(lit("old").as("tp")).as("m"))))
      .drop("raw")
    val fixed = PatchJob.patchContentItems(issues,
      ci => ci.withField("m.tp", lit("article")))
    assert(fixed.select(col("i").getItem(0).getField("m").getField("tp"))
      .head().getString(0) == "article")
  }
}
