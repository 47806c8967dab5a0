package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.xml.XML

/** Offline enrichment fetchers: runnable jobs that materialize the
  * side tables the live-API-dependent importers consume.
  *
  * The reference fetches during detect/parse — BNF-EN resolves issue
  * IIIF ark ids from the Gallica API while detecting
  * (bnf_en/detect.py:162-263), BCUL pulls per-page IIIF links from the
  * Scriptorium presentation API while parsing (bcul/classes.py:204-271).
  * Fetching inside a distributed import is re-execution-unsafe (Spark
  * tasks retry; a flaky endpoint poisons deterministic output), so this
  * engine splits the work: these bounded driver-side jobs fetch ONCE and
  * write parquet, and [[graft.parse.BnfEnImporter]] /
  * [[graft.parse.BculImporter]] consume the tables with no network at
  * parse time.
  *
  * The HTTP transport is pluggable (`Http = String => String`) so specs
  * mock endpoints byte-for-byte (EnrichFetchersSpec) and the zero-egress
  * sandbox never opens a socket; production wires [[Enrich.httpClient]].
  */
object Enrich {
  /** url → response body. */
  type Http = String => String

  /** Non-200 response. 5xx / 429 / 408 are transient (retryable);
    * other statuses (404, 403, …) are deterministic — retrying them
    * only multiplies load on an endpoint that will never succeed. */
  final case class HttpStatusException(url: String, status: Int)
      extends RuntimeException(s"GET $url failed with status $status") {
    def transient: Boolean = status >= 500 || status == 429 || status == 408
  }

  /** `java.net.http`-backed transport (production). */
  def httpClient(timeoutSec: Int = 60): Http = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
      .build()
    url => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSec.toLong)).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw HttpStatusException(url, resp.statusCode())
      resp.body()
    }
  }

  /** Retry wrapper with the reference's 3-attempt contract
    * (bcul/classes.py:204-244 query_iiif_api: three tries, paced).
    *
    * Deterministic failures — non-transient HTTP statuses (4xx except
    * 408/429) and `IllegalArgumentException` — fail fast on the first
    * attempt. Transient ones sleep `pauseMs * attempt` between tries
    * (linear backoff). The terminal throw keeps the full retry history:
    * earlier attempts' exceptions ride along as suppressed.
    *
    * `sleep` is injectable so specs assert the pacing without waiting.
    */
  def withRetries(http: Http, maxAttempts: Int = 3, pauseMs: Long = 1000L,
      sleep: Long => Unit = Thread.sleep): Http = { url =>
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    def fail(e: Exception, prior: List[Exception]): Nothing = {
      prior.foreach(e.addSuppressed)
      throw e
    }
    def go(attempt: Int, prior: List[Exception]): String =
      try http(url)
      catch {
        case e: HttpStatusException if !e.transient => fail(e, prior)
        case e: IllegalArgumentException => fail(e, prior)
        case scala.util.control.NonFatal(e: Exception)
            if attempt < maxAttempts =>
          sleep(pauseMs * attempt)
          go(attempt + 1, e :: prior)
        case e: Exception => fail(e, prior)
      }
    go(1, Nil)
  }
}

/** Gallica issue-ark fetcher for the BNF-EN (Europeana) collections
  * (bnf_en/detect.py:162-263 get_issues_iiif_arks /
  * construct_iiif_arks). Each journal has a journal-level ark; the
  * Issues service lists its years, then per-year issue elements
  * carrying the issue-level IIIF ark and a `dayofyear`. The job
  * rebuilds each issue's canonical id (alias-YYYY-MM-DD-x with
  * consecutive same-day issues lettered a, b, …) and writes the
  * (issue_id, ark) table [[graft.parse.BnfEnImporter.detectIssues]]
  * takes as its `arkTable`.
  */
object GallicaArks {

  val ApiBase = "https://gallica.bnf.fr/services/Issues"
  def journalUrl(ark: String): String = s"$ApiBase?ark=$ark/date"
  def issueUrl(ark: String, year: Int): String =
    s"$ApiBase?ark=$ark/date&date=$year"

  /** One `<issue ark=… dayofyear=…>text</issue>` element. */
  final case class ApiIssue(ark: String, dayOfYear: Int, text: String)

  def parseYears(xml: String): Seq[Int] =
    (XML.loadString(xml) \\ "year").map(_.text.trim.toInt).toSeq

  def parseIssues(xml: String): Seq[ApiIssue] =
    (XML.loadString(xml) \\ "issue").map { n =>
      ApiIssue((n \ "@ark").text, (n \ "@dayofyear").text.trim.toInt,
        n.text.trim)
    }.toSeq

  /** (issue canonical id, iiif ark) for one journal, chronological.
    *
    * Mirrors the reference's year walk including its Dec-31 quirk fix
    * (detect.py:76-159 fix_api_year_mismatch): the API sometimes lists
    * the December 31st issue(s) of year Y−1 at the END of year Y's
    * list (recognizable because the element text names Y−1) — and a
    * double-edition day can put TWO such strays there (the reference's
    * api_issues[-2] check, detect.py:112-117). Years are walked
    * descending; strays are detached and re-attached as Dec 31 of the
    * next processed year ONLY when their text actually names that year
    * (detect.py:131 verifies before re-attaching — a non-contiguous
    * year list drops the strays instead of re-dating them to the wrong
    * year's Dec 31), and not when that year's own list already ends on
    * Dec 31 (duplicate listing → dropped). */
  def issueArks(http: Enrich.Http, alias: String, journalArk: String)
      : Seq[(String, String)] = {
    val years = parseYears(http(journalUrl(journalArk)))
    var carried: Seq[ApiIssue] = Nil
    val perYear = years.sorted(Ordering[Int].reverse).map { year =>
      val raw = parseIssues(http(issueUrl(journalArk, year)))
      // only TRAILING elements can be strays: [-1], and [-2] for a
      // two-edition Dec 31 (detect.py:101,112)
      val prevYear = (year - 1).toString
      val nStrays =
        if (raw.nonEmpty && raw.last.text.contains(prevYear)) {
          if (raw.length >= 2 && raw(raw.length - 2).text.contains(prevYear)) 2
          else 1
        } else 0
      val (mine, strays) = raw.splitAt(raw.length - nStrays)
      val dec31 = java.time.LocalDate.of(year, 12, 31).getDayOfYear
      val carriedHere =
        if (mine.nonEmpty && mine.last.dayOfYear == dec31) Nil
        else carried.filter(_.text.contains(year.toString))
          .map(_.copy(dayOfYear = dec31))
      val dated = (mine ++ carriedHere).map { i =>
        (java.time.LocalDate.ofYearDay(year, i.dayOfYear), i.ark)
      }
      carried = strays
      year -> dated
    }
    // chronological output; consecutive same-day issues letter a, b, …
    perYear.sortBy(_._1).flatMap { case (_, dated) =>
      var prev: java.time.LocalDate = null
      var edition = 0
      dated.sortBy(_._1.toEpochDay).map { case (date, ark) =>
        edition = if (date == prev) edition + 1 else 0
        prev = date
        val id = f"$alias-${date.getYear}%04d-${date.getMonthValue}%02d-" +
          f"${date.getDayOfMonth}%02d-${('a' + edition).toChar}"
        (id, ark)
      }
    }
  }

  /** Fetch every journal's issue arks and write the (issue_id, ark)
    * parquet table. Driver-side by design: the fetch count is bounded
    * (years × journals requests), results are the durable artifact,
    * and no Spark task ever re-executes a network call. For a very
    * large journal set, shard `journals` across invocations writing
    * distinct `outPath`s and union them at read time.
    *
    * Per-journal failures (endpoint down past retries, malformed XML)
    * QUARANTINE rather than abort — the repo's importer contract: good
    * journals land in the table, failures land beside it in
    * `<outPath>_quarantine` as (alias, error) rows, and the job
    * reports both. A failed journal's issues simply stay un-imported
    * until a re-fetch, exactly like the reference's skip-and-log
    * (detect.py logs API errors and drops the issue). */
  def buildArkTable(spark: SparkSession, http: Enrich.Http,
      journals: Map[String, String], outPath: String): DataFrame = {
    import spark.implicits._
    val attempts = journals.toSeq.sortBy(_._1).map { case (alias, ark) =>
      try Right(issueArks(http, alias, ark))
      catch { case scala.util.control.NonFatal(e) =>
        Left(alias -> s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    val rows = attempts.collect { case Right(r) => r }.flatten
    val failed = attempts.collect { case Left(f) => f }
    val qPath = new org.apache.hadoop.fs.Path(s"${outPath}_quarantine")
    if (failed.nonEmpty)
      failed.toDF("alias", "error")
        .write.mode("overwrite").parquet(qPath.toString)
    else {
      // a clean re-run must not leave a previous run's stale quarantine
      val fs = qPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(qPath)) fs.delete(qPath, true)
    }
    rows.toDF("issue_id", "ark")
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** Load a table written by [[buildArkTable]] into the `arkTable` map
    * [[graft.parse.BnfEnImporter.detectIssues]] consumes (bounded:
    * one entry per issue of the configured journals). */
  def loadArkTable(spark: SparkSession, path: String): Map[String, String] =
    spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
}

/** Scriptorium IIIF canvas fetcher for BCUL XML-flavoured issues
  * (bcul/classes.py:204-271 query_iiif_api + _get_iiif_link_xml).
  * Each issue's presentation manifest lists page canvases; the page's
  * IIIF image base uri is the canvas image id with its last four path
  * segments (region/size/rotation/quality.format) stripped. The job
  * writes a (issue_id, page_no, iiif_base) table; the importer consumes
  * it through [[tableCanvasProvider]] with no network at parse time.
  */
object ScriptoriumCanvases {

  /** Fields actually consumed from the manifest — everything else is
    * pruned at parse (classes.py:222 response.json()["sequences"][0]
    * ["canvases"]). */
  private val manifestSchema =
    "sequences array<struct<canvases: array<struct<label: string, " +
      "images: array<struct<resource: struct<`@id`: string>>>>>>>"

  /** Fetch each issue's manifest and write the per-page IIIF table.
    * Fetches are bounded driver work (one request per issue); the
    * PARSE is a Spark job (from_json over the collected bodies), so a
    * million-issue backfill still parses distributed — only the
    * network loop is serial, and it can be sharded across invocations
    * like [[GallicaArks.buildArkTable]]. */
  def buildCanvasTable(spark: SparkSession, http: Enrich.Http,
      manifests: Seq[(String, String)], outPath: String): DataFrame = {
    import spark.implicits._
    val bodies = manifests.map { case (id, url) => (id, http(url)) }
    bodies.toDF("issue_id", "body")
      .withColumn("m", from_json(col("body"),
        org.apache.spark.sql.types.StructType.fromDDL(manifestSchema)))
      .select(col("issue_id"),
        posexplode(element_at(col("m.sequences"), 1).getField("canvases")))
      .select(col("issue_id"),
        col("col.label").cast("int").as("page_no"),
        element_at(col("col.images"), 1)
          .getField("resource").getField("@id").as("iiif"))
      // strip /{region}/{size}/{rotation}/{quality}.{format}
      .withColumn("iiif_base", array_join(
        slice(split(col("iiif"), "/"), lit(1),
          size(split(col("iiif"), "/")) - 4),
        "/"))
      .select(col("issue_id"), col("page_no"), col("iiif_base"))
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** [[graft.parse.BculImporter.CanvasProvider]] view of a fetched
    * table: (issue_id, page_no) → iiif base, falling back to the
    * offline stem-derived uri for pages the manifest did not list
    * (classes.py:268-270 logs and skips; the importer's documented
    * fallback keeps the page with its derivable uri instead). */
  def tableCanvasProvider(spark: SparkSession, path: String)
      : graft.parse.BculImporter.CanvasProvider = {
    val byPage: Map[(String, Int), String] =
      spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    new graft.parse.BculImporter.CanvasProvider {
      def pageIiif(issueId: String, stem: String, pageNo: Int)
          : Option[String] = byPage.get((issueId, pageNo))
    }
  }
}
