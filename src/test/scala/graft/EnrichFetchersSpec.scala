package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.{Enrich, GallicaArks, ScriptoriumCanvases}

/** Offline enrichment fetchers against mocked endpoints — the
  * zero-egress stand-in for Gallica (bnf_en/detect.py:162-263) and the
  * Scriptorium IIIF API (bcul/classes.py:204-271). */
class EnrichFetchersSpec extends AnyFunSuite {
  import SparkTestSession._

  // --- Gallica mock: 2 years; 1900 carries a stray Dec-31-1899 issue
  // at the end of its list (the API quirk fix_api_year_mismatch
  // exists for), and 1899 has two issues on the same day (editions).
  private val journalArk = "ark:/12148/cb32895690j"
  private def gallicaMock: Enrich.Http = {
    case url if url == GallicaArks.journalUrl(journalArk) =>
      "<issues><year>1899</year><year>1900</year></issues>"
    case url if url == GallicaArks.issueUrl(journalArk, 1900) =>
      """<issues>
        |  <issue ark="i1900a" dayofyear="1">1 janvier 1900</issue>
        |  <issue ark="i1900b" dayofyear="32">1 février 1900</issue>
        |  <issue ark="s1899" dayofyear="365">31 décembre 1899</issue>
        |</issues>""".stripMargin
    case url if url == GallicaArks.issueUrl(journalArk, 1899) =>
      """<issues>
        |  <issue ark="i1899a" dayofyear="59">28 février 1899</issue>
        |  <issue ark="i1899b" dayofyear="59">28 février 1899 (2e ed)</issue>
        |</issues>""".stripMargin
    case url => fail(s"unexpected fetch: $url")
  }

  test("gallica ark fetch: canonical ids, editions, Dec-31 carry-down") {
    val links = GallicaArks.issueArks(gallicaMock, "oerennes", journalArk)
    assert(links == Seq(
      "oerennes-1899-02-28-a" -> "i1899a",
      "oerennes-1899-02-28-b" -> "i1899b", // same day -> next letter
      "oerennes-1899-12-31-a" -> "s1899",  // stray re-attached to 1899
      "oerennes-1900-01-01-a" -> "i1900a",
      "oerennes-1900-02-01-a" -> "i1900b"))
  }

  test("gallica stray is dropped when the target year already ends Dec 31") {
    val mock: Enrich.Http = {
      case url if url == GallicaArks.journalUrl(journalArk) =>
        "<issues><year>1899</year><year>1900</year></issues>"
      case url if url == GallicaArks.issueUrl(journalArk, 1900) =>
        """<issues><issue ark="s1899dup" dayofyear="365">31 décembre 1899</issue></issues>"""
      case url if url == GallicaArks.issueUrl(journalArk, 1899) =>
        """<issues><issue ark="i1899dec" dayofyear="365">31 décembre 1899</issue></issues>"""
      case url => fail(s"unexpected fetch: $url")
    }
    val links = GallicaArks.issueArks(mock, "oerennes", journalArk)
    assert(links == Seq("oerennes-1899-12-31-a" -> "i1899dec"))
  }

  test("gallica ark table round-trips through parquet to the importer's map") {
    val out = java.nio.file.Files.createTempDirectory("arks").toString + "/t"
    GallicaArks.buildArkTable(spark, gallicaMock,
      Map("oerennes" -> journalArk), out)
    val m = GallicaArks.loadArkTable(spark, out)
    assert(m.size == 5 && m("oerennes-1899-12-31-a") == "s1899")
  }

  test("a failing journal quarantines; the rest of the fetch lands") {
    val out = java.nio.file.Files.createTempDirectory("arksq").toString + "/t"
    val mixed: Enrich.Http = {
      case u if u.contains("brokenark") => "<<<not xml at all"
      case u => gallicaMock(u)
    }
    val df = GallicaArks.buildArkTable(spark, mixed,
      Map("oerennes" -> journalArk, "dead" -> "brokenark"), out)
    assert(df.count() == 5) // the good journal fully landed
    val q = spark.read.parquet(s"${out}_quarantine").collect()
    assert(q.length == 1 && q(0).getString(0) == "dead")
    assert(q(0).getString(1).nonEmpty)
    // a clean re-fetch clears the stale quarantine
    GallicaArks.buildArkTable(spark, gallicaMock,
      Map("oerennes" -> journalArk), out)
    assert(!new java.io.File(s"${out}_quarantine").exists())
  }

  // --- Scriptorium mock: one manifest, 2 canvases; image ids carry
  // the /full/full/0/default.jpg suffix the base-uri strip removes.
  private val manifestUrl =
    "https://scriptorium.bcu-lausanne.ch/api/iiif/GDL_1900_01_01/manifest"
  private def iiifMock: Enrich.Http = {
    case `manifestUrl` =>
      """{"sequences":[{"canvases":[
        |{"label":"1","images":[{"resource":
        |  {"@id":"https://scriptorium.bcu-lausanne.ch/api/iiif-img/GDL19000101p1/full/full/0/default.jpg"}}]},
        |{"label":"2","images":[{"resource":
        |  {"@id":"https://scriptorium.bcu-lausanne.ch/api/iiif-img/GDL19000101p2/full/full/0/default.jpg"}}]}
        |]}]}""".stripMargin
    case url => fail(s"unexpected fetch: $url")
  }

  test("scriptorium canvas fetch strips the 4 iiif suffix segments") {
    val out = java.nio.file.Files.createTempDirectory("canv").toString + "/t"
    val df = ScriptoriumCanvases.buildCanvasTable(spark, iiifMock,
      Seq("GDL-1900-01-01-a" -> manifestUrl), out)
    val rows = df.orderBy("page_no").collect()
      .map(r => (r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      1 -> "https://scriptorium.bcu-lausanne.ch/api/iiif-img/GDL19000101p1",
      2 -> "https://scriptorium.bcu-lausanne.ch/api/iiif-img/GDL19000101p2"))
    val provider = ScriptoriumCanvases.tableCanvasProvider(spark, out)
    assert(provider.pageIiif("GDL-1900-01-01-a", "GDL19000101p2", 2)
      .contains("https://scriptorium.bcu-lausanne.ch/api/iiif-img/GDL19000101p2"))
    assert(provider.pageIiif("GDL-1900-01-01-a", "x", 3).isEmpty)
  }

  test("gallica two-edition Dec-31 stray: both carry down as lettered editions") {
    // detect.py:112-117 — the API can list TWO Dec-31 editions of year
    // Y-1 at the end of year Y's list (api_issues[-2] also names Y-1)
    val mock: Enrich.Http = {
      case url if url == GallicaArks.journalUrl(journalArk) =>
        "<issues><year>1899</year><year>1900</year></issues>"
      case url if url == GallicaArks.issueUrl(journalArk, 1900) =>
        """<issues>
          |  <issue ark="i1900a" dayofyear="1">1 janvier 1900</issue>
          |  <issue ark="s1899a" dayofyear="365">31 décembre 1899</issue>
          |  <issue ark="s1899b" dayofyear="365">31 décembre 1899 (2e ed)</issue>
          |</issues>""".stripMargin
      case url if url == GallicaArks.issueUrl(journalArk, 1899) =>
        """<issues><issue ark="i1899a" dayofyear="1">1 janvier 1899</issue></issues>"""
      case url => fail(s"unexpected fetch: $url")
    }
    val links = GallicaArks.issueArks(mock, "oerennes", journalArk)
    assert(links == Seq(
      "oerennes-1899-01-01-a" -> "i1899a",
      "oerennes-1899-12-31-a" -> "s1899a",
      "oerennes-1899-12-31-b" -> "s1899b",
      "oerennes-1900-01-01-a" -> "i1900a"))
  }

  test("gallica stray is dropped when the next processed year doesn't match") {
    // detect.py:131 verifies the stored issue's text names the target
    // year; with a non-contiguous year list (1899 absent) the stray
    // must NOT be re-dated to 1897's Dec 31
    val mock: Enrich.Http = {
      case url if url == GallicaArks.journalUrl(journalArk) =>
        "<issues><year>1897</year><year>1900</year></issues>"
      case url if url == GallicaArks.issueUrl(journalArk, 1900) =>
        """<issues>
          |  <issue ark="i1900a" dayofyear="1">1 janvier 1900</issue>
          |  <issue ark="s1899" dayofyear="365">31 décembre 1899</issue>
          |</issues>""".stripMargin
      case url if url == GallicaArks.issueUrl(journalArk, 1897) =>
        """<issues><issue ark="i1897a" dayofyear="1">1 janvier 1897</issue></issues>"""
      case url => fail(s"unexpected fetch: $url")
    }
    val links = GallicaArks.issueArks(mock, "oerennes", journalArk)
    assert(links == Seq(
      "oerennes-1897-01-01-a" -> "i1897a",
      "oerennes-1900-01-01-a" -> "i1900a"))
  }

  test("retry wrapper: 3 paced attempts, terminal throw keeps the history") {
    var calls = 0
    val flaky: Enrich.Http = { _ =>
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(Enrich.withRetries(flaky, sleep = _ => ())("u") == "ok")
    assert(calls == 3)
    // always-failing endpoint: exactly 3 attempts (the reference's
    // bcul/classes.py:204-244 contract), linear pacing between them,
    // and the terminal exception carries the earlier ones as suppressed
    var calls2 = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val dead: Enrich.Http = { _ =>
      calls2 += 1; throw new RuntimeException(s"down $calls2")
    }
    val e = intercept[RuntimeException](
      Enrich.withRetries(dead, pauseMs = 10L, sleep = sleeps += _)("u"))
    assert(calls2 == 3)
    assert(sleeps.toSeq == Seq(10L, 20L), "linear backoff between attempts")
    assert(e.getMessage == "down 3")
    assert(e.getSuppressed.map(_.getMessage).toSet == Set("down 1", "down 2"))
  }

  test("retry wrapper fails fast on deterministic errors, retries transient ones") {
    // 404 is deterministic: one call, no sleeps
    var calls404 = 0
    val notFound: Enrich.Http = { u =>
      calls404 += 1; throw Enrich.HttpStatusException(u, 404)
    }
    intercept[Enrich.HttpStatusException](
      Enrich.withRetries(notFound, sleep = _ => fail("must not pace"))("u"))
    assert(calls404 == 1)
    // IllegalArgumentException (caller bug) likewise
    var callsIae = 0
    val bad: Enrich.Http = { _ =>
      callsIae += 1; throw new IllegalArgumentException("bad url")
    }
    intercept[IllegalArgumentException](
      Enrich.withRetries(bad, sleep = _ => fail("must not pace"))("u"))
    assert(callsIae == 1)
    // 503 is transient: retried to success
    var calls503 = 0
    val busy: Enrich.Http = { u =>
      calls503 += 1
      if (calls503 < 2) throw Enrich.HttpStatusException(u, 503) else "ok"
    }
    assert(Enrich.withRetries(busy, sleep = _ => ())("u") == "ok")
    assert(calls503 == 2)
  }
}
