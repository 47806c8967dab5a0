package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.discover.Discover
import graft.discover.Discover.SelectConfig

class DiscoverSpec extends AnyFunSuite {
  import SparkTestSession._

  /** base/ALIAS/YYYY/MM/DD[/ed] fixture tree. */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("discover").toString
    val layout = Seq(
      "GDL/1900/01/02", "GDL/1900/01/03/a", "GDL/1900/01/03/b",
      "GDL/1910/05/01", "JDG/1900/01/02", "IMP/1950/12/31")
    layout.foreach(p => new java.io.File(dir, p).mkdirs())
    dir
  }

  test("detect walks ALIAS/YYYY/MM/DD[/edition]") {
    val df = Discover.detectIssues(spark, base)
    assert(df.count() == 6)
    val gdl3 = df.filter(col("alias") === "GDL" &&
      col("date") === "1900-01-03").orderBy("edition").collect()
    assert(gdl3.map(_.getAs[String]("edition")).sameElements(Array("a", "b")))
    // default edition when no edition dir
    assert(df.filter(col("edition") === "a").count() == 5)
  }

  test("select applies include/exclude and date ranges") {
    val df = Discover.detectIssues(spark, base)
    val cfg = SelectConfig(
      titles = Map("GDL" -> Some("1900/01/01-1905/12/31")),
      excludeTitles = Set("IMP"))
    val sel = Discover.select(df, cfg).collect()
    assert(sel.forall(_.getAs[String]("alias") == "GDL"))
    assert(sel.length == 3) // 1900 issues only, 1910 excluded by range
    val yearCfg = SelectConfig(
      titles = Map("GDL" -> Some("1910")), yearOnly = true)
    assert(Discover.select(df, yearCfg).count() == 1)
    val allButImp = SelectConfig(excludeTitles = Set("IMP"))
    assert(Discover.select(df, allButImp).count() == 5)
  }

  test("incremental anti-join skips already-imported issues") {
    val df = Discover.detectIssues(spark, base)
    val done = df.filter(col("alias") === "GDL" && year(col("date")) === 1900)
    val remaining = Discover.incremental(df, done)
    assert(remaining.count() == 3)
    assert(remaining.filter(col("alias") === "GDL").count() == 1)
  }

  test("multimodal metadata drops payloads before any shuffle-side use") {
    val media = graft.operators.Multimodal.syntheticMedia(spark, sf)
    val meta = graft.operators.Multimodal.extractMetadata(media)
    assert(meta.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "checksum", "width", "height",
        "duration_ms"))
    assert(meta.count() == media.count())
    val frames = graft.operators.Multimodal.sampleFrames(media, 1000, 5)
    assert(frames.groupBy("media_id").count()
      .agg(max("count")).collect()(0).getLong(0) <= 5)
  }
}
