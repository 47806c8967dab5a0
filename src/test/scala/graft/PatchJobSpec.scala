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

  test("patch7 rescales issue image coords via the resolution table") {
    import spark.implicits._
    // two issues: one in the table (scale 300→150, i.e. halve), one not
    val issues = Seq(
      ("LCG-1900-01-05-a", Seq((Seq(100, 200, 301, 401), true)),
        Seq.empty[Int]),
      ("LCG-1900-01-06-a", Seq((Seq(10, 20, 30, 40), true)), Seq.empty[Int]))
      .toDF("id", "raw", "unused")
      .withColumn("i", transform(col("raw"), r => struct(
        struct(lit("x").as("id"), r.getField("_1").as("c")).as("m"),
        lit(null).cast("array<int>").as("c"))))
      .drop("raw", "unused")
    val res = Seq(("LCG-1900-01-05-a", 300, 150))
      .toDF("issue_id", "curr_res", "dest_res")
    val out = PatchJob.patch7RescaleIssues(issues, res)
      .select(col("id"), col("patched"), col("i")(0).getField("m").getField("c"))
      .as[(String, Boolean, Seq[Int])].collect()
      .map { case (k, v, c) => k -> ((v, c)) }.toMap
    // int(c * 150 / 300): truncation like Python int()
    assert(out("LCG-1900-01-05-a") == ((true, Seq(50, 100, 150, 200))))
    assert(out("LCG-1900-01-06-a") == ((false, Seq(10, 20, 30, 40))))
  }

  test("patch7 rescales page region/line/token coords, not paragraphs") {
    import spark.implicits._
    val pages = spark.read.schema(RebuildJob.pageSchema).json(Seq(
      """{"id":"LCG-1900-01-05-a-p0001","cc":true,"r":[
        |{"c":[10,10,21,21],"pOf":"x","p":[
        |  {"c":[99,99,99,99],"l":[
        |    {"c":[11,11,15,15],"t":[{"c":[12,12,13,13],"tx":"w"}]}]}]}]}"""
        .stripMargin.replaceAll("\n", "")).toDS())
    val res = Seq(("LCG-1900-01-05-a", 300, 600))
      .toDF("issue_id", "curr_res", "dest_res")
    val out = PatchJob.patch7RescalePages(pages, res)
    val r0 = out.select(col("r")(0)).first().getStruct(0)
    assert(r0.getAs[scala.collection.Seq[Int]]("c").toSeq == Seq(20, 20, 42, 42))
    val p0 = r0.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p").head
    // paragraph boxes are untouched (convert_page_coords counts only
    // regions + lines + tokens)
    assert(p0.getAs[scala.collection.Seq[Int]]("c").toSeq == Seq(99, 99, 99, 99))
    val l0 = p0.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("l").head
    assert(l0.getAs[scala.collection.Seq[Int]]("c").toSeq == Seq(22, 22, 30, 30))
    val t0 = l0.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("t").head
    assert(t0.getAs[scala.collection.Seq[Int]]("c").toSeq == Seq(24, 24, 26, 26))
    // an unlisted page passes through identically
    val other = spark.read.schema(RebuildJob.pageSchema).json(Seq(
      """{"id":"LCG-1900-01-06-a-p0001","cc":true,"r":[
        |{"c":[10,10,21,21],"pOf":"x","p":[]}]}""".stripMargin
        .replaceAll("\n", "")).toDS())
    val o0 = PatchJob.patch7RescalePages(other, res)
    assert(o0.filter(col("patched")).count() == 0)
    assert(o0.select(col("r")(0).getField("c")).first()
      .getAs[scala.collection.Seq[Int]](0).toSeq == Seq(10, 10, 21, 21))
  }

  test("patch7 audit reports image-info and zip resolutions per issue") {
    import graft.jobs.Patch7Audit
    val base = java.nio.file.Files.createTempDirectory("p7audit")
    val img = base.resolve("img"); val og = base.resolve("og")
    // converted tree: LCG/1900/01/05/a with image-info.json
    val issueDir = img.resolve("LCG/1900/01/05/a")
    java.nio.file.Files.createDirectories(issueDir)
    java.nio.file.Files.write(issueDir.resolve("LCG-image-info.json"),
      """[{"s":"Pg001_300.png","strat":"resize","s_dim":[100,200],
        |"d_dim":[50,100]}]""".stripMargin.replaceAll("\n", "")
        .getBytes("UTF-8"))
    // a second issue missing its info file
    val issueDir2 = img.resolve("LCG/1900/01/06/a")
    java.nio.file.Files.createDirectories(issueDir2)
    // original tree (no edition leaf): Document.zip with image entries
    val ogDir = og.resolve("LCG/1900/01/05")
    java.nio.file.Files.createDirectories(ogDir)
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(ogDir.resolve("Document.zip")))
    Seq("1/Img/Pg001_300.png", "1/Img/Pg001.png", "1/Txt/Pg001.xml")
      .foreach { n =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.closeEntry() }
    zos.close()

    val rows = Patch7Audit.run(spark, img.toString, og.toString)
      .collect().map(r => r.issue_id -> r).toMap
    assert(rows.keySet == Set("LCG-1900-01-05-a", "LCG-1900-01-06-a"))
    val ok = rows("LCG-1900-01-05-a")
    assert(ok.info_file_present && ok.zip_doc_present)
    assert(ok.conv.head.strat.contains("resize"))
    assert(ok.conv.head.s_dim.contains("[100,200]"))
    assert(ok.zip_img_contents.toSet ==
      Set("1/Img/Pg001_300.png", "1/Img/Pg001.png"))
    assert(ok.resolutions == Seq("1/Img/Pg001_300.png"))
    val missing = rows("LCG-1900-01-06-a")
    assert(!missing.info_file_present && !missing.zip_doc_present)
    assert(missing.zip_error.isEmpty)
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

  test("patch 5 patches only the listed titles and stamps ro") {
    // canonical_patch_5_rero.py:60-89: only the RERO 2/3 title list is
    // fetched/patched; other titles never enter the job
    val issues = graft.queries.RebuildQueries.syntheticIssues(spark, sf)
    val patched = PatchJob.patch5AddReadingOrder(issues, Seq("D2", "D5"))
    val aliases = patched
      .select(regexp_extract(col("id"), "^([^-]+)-", 1).as("alias"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(aliases == Set("D2", "D5"))
    // every CI carries the stamped reading order 1..n_cis
    val badRo = patched.select(explode(col("i")).as("ci"))
      .select(col("ci.m.ro").as("ro"))
      .filter(col("ro").isNull || col("ro") < 1 || col("ro") > 2).count()
    assert(badRo == 0)
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
