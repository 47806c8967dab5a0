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
