package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.LuxImporter
import graft.parse.LuxImporter.IssueRef

/** Distributed Lux (BNL Mets/Alto) import: detect issue directories on
  * the driver (cheap listing), parse each issue + its pages executor-side
  * (the expensive XML work), and collect canonical JSONL outputs.
  *
  * Spark shape vs the reference (generic_importer.py:162 →
  * core.py:330-518): detect stays a driver-side walk producing a small
  * descriptor Dataset; `dirs2issues`/`issue2supports` collapse into ONE
  * flatMap per issue that emits the issue line and its page lines — no
  * groupby shuffle at all, because Spark's partitioned write replaces the
  * reference's manual (alias, year) regrouping + FileLock append
  * (core.py:576-655, the reference's own TODO at :429-437).
  *
  * Error semantics: a failing issue becomes a quarantine row; the job
  * never dies on one corrupt input (core.py:110-146).
  */
object LuxImportJob {

  case class ImportResult(
      issueId: String,
      issueJson: Option[String],
      pages: Seq[(String, String)],
      error: Option[String])

  /** Parse all issues under `baseDir`. `cdt`/`ts` are injected clocks so
    * outputs are reproducible (golden tests exclude wall-clock noise). */
  def run(spark: SparkSession, baseDir: String,
      cdt: String, ts: String): Dataset[ImportResult] = {
    import spark.implicits._
    val refs = LuxImporter.detectIssues(baseDir)
    val parallelism = math.max(1, math.min(refs.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(refs)
      .repartition(parallelism)
      .map { ref =>
        try {
          val p = LuxImporter.parseIssue(ref, cdt, ts)
          ImportResult(p.issueId, Some(p.issueJson), p.pageJsons, None)
        } catch {
          case e: Exception =>
            ImportResult(ref.issueId, None, Nil,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
  }

  def issues(results: Dataset[ImportResult]): Dataset[String] = {
    import results.sparkSession.implicits._
    results.flatMap(_.issueJson)
  }

  def pages(results: Dataset[ImportResult]): Dataset[(String, String)] = {
    import results.sparkSession.implicits._
    results.flatMap(_.pages)
  }

  def quarantine(results: Dataset[ImportResult]): DataFrame = {
    import results.sparkSession.implicits._
    results.flatMap(r => r.error.map(e => (r.issueId, e)))
      .toDF("issue_id", "error")
  }

  /** Write canonical outputs: issues as `{alias}-{year}` partitions, pages
    * grouped per issue (S7/S8; core.py:530-655). */
  def write(results: Dataset[ImportResult], outDir: String): Unit = {
    val spark = results.sparkSession
    import spark.implicits._
    issues(results)
      .withColumn("alias", regexp_extract(col("value"), "\"id\":\"([^-]+)-", 1))
      .withColumn("year", regexp_extract(col("value"), "-(\\d{4})-", 1))
      .repartition(col("alias"), col("year"))
      .write.mode("overwrite").partitionBy("alias", "year")
      .option("compression", "bzip2").text(s"$outDir/issues")
    pages(results)
      .toDF("page_id", "value")
      .withColumn("issue_id", regexp_replace(col("page_id"), "-p\\d+$", ""))
      .repartition(col("issue_id"))
      .select(col("issue_id"), col("value"))
      .write.mode("overwrite").partitionBy("issue_id")
      .option("compression", "bzip2").text(s"$outDir/pages")
  }
}
