package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FuzzyMatch
import graft.sources.ZipSource

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zip source reads entries executor-side without temp files") {
    val dir = Files.createTempDirectory("zips").toString
    for (i <- 1 to 3) {
      val zos = new ZipOutputStream(
        new FileOutputStream(s"$dir/issue$i.zip"))
      zos.putNextEntry(new ZipEntry(s"text/page$i.xml"))
      zos.write(s"<page n='$i'/>".getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new ZipEntry("meta/info.json"))
      zos.write("{}".getBytes("UTF-8"))
      zos.closeEntry()
      zos.close()
    }
    val all = ZipSource.read(spark, dir).collect()
    assert(all.length == 6)
    val xmlOnly = ZipSource.read(spark, dir, _.endsWith(".xml")).collect()
    assert(xmlOnly.length == 3)
    val row = xmlOnly.find(_.getAs[String]("entry") == "text/page2.xml").get
    assert(new String(row.getAs[Array[Byte]]("bytes"), "UTF-8") ==
      "<page n='2'/>")
  }

  test("tar shards: write → read round-trips bytes, layout is deterministic") {
    import graft.sources.TarShards
    import org.apache.spark.sql.functions.{col, encode}
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, ""),
      (10L, "x" * 600), (11L, "padded to block boundary" + "y" * 488))
      .toDF("doc_id", "text")
      .select(col("doc_id").cast("string").as("name"),
        encode(col("text"), "UTF-8").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("tar-rt").toString
    TarShards.write(docs, "name", "payload", dir, nShards = 2)
    val back = TarShards.read(spark, dir)
      .collect().map(r => r.getString(1) ->
        new String(r.getAs[Array[Byte]]("bytes"), "UTF-8")).toMap
    assert(back == Map("1" -> "alpha", "2" -> "beta", "3" -> "",
      "10" -> "x" * 600,
      "11" -> ("padded to block boundary" + "y" * 488)))
    // re-run writes byte-identical shards (pinned metadata, seeded
    // order): the format is a pure function of the entries
    val files = new java.io.File(dir).listFiles().filter(
      _.getName.endsWith(".tar")).sortBy(_.getName)
    val sums1 = files.map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    TarShards.write(docs, "name", "payload", dir, nShards = 2)
    val sums2 = files.map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    assert(sums1.toSeq == sums2.toSeq)
    // a GNU/system tar can list our archives? parse our own bytes with
    // a flipped checksum byte -> strict failure, not silent truncation
    val bytes = java.nio.file.Files.readAllBytes(files(0).toPath)
    bytes(148) = '9'
    val e = intercept[IllegalArgumentException] {
      TarShards.parse(bytes)
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("tar shards: read refuses unmanifested or torn shard sets") {
    import graft.sources.TarShards
    import org.apache.spark.sql.functions.{col, encode}
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
      .select(col("doc_id").cast("string").as("name"),
        encode(col("text"), "UTF-8").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("tar-cp").toString
    TarShards.write(docs, "name", "payload", dir, nShards = 2)
    assert(TarShards.read(spark, dir).count() == 3)
    // a job that died before the driver's manifest publish looks like
    // this: shards present, no _MANIFEST -> read refuses
    val manifest = new java.io.File(dir, "_MANIFEST")
    val saved = java.nio.file.Files.readAllBytes(manifest.toPath)
    assert(manifest.delete())
    val e1 = intercept[IllegalArgumentException] {
      TarShards.read(spark, dir)
    }
    assert(e1.getMessage.contains("_MANIFEST"))
    // a torn shard (size != manifest) -> read refuses
    java.nio.file.Files.write(manifest.toPath, saved)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    java.nio.file.Files.write(shard.toPath, Array[Byte](0))
    val e2 = intercept[IllegalArgumentException] {
      TarShards.read(spark, dir)
    }
    assert(e2.getMessage.contains("torn"))
  }

  test("fuzzy title match finds near occurrences within tolerance") {
    assert(FuzzyMatch.levenshtein("kitten", "sitting") == 3)
    assert(FuzzyMatch.levenshtein("abc", "abc") == 0)
    val text = "Im Namen der Eidgenossenschaft. Bundesbeschluss betreffend"
    // exact
    assert(FuzzyMatch.find(text, "Bundesbeschluss").contains((32, 0)))
    // one OCR error within default tolerance (len 15 -> tol 1)
    assert(FuzzyMatch.find(text, "Bundesbesch1uss").exists(_._2 == 1))
    // far-off pattern not found
    assert(FuzzyMatch.find(text, "zzzzzzzzzzzzzzzz").isEmpty)
  }
}
