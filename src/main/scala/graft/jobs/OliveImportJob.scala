package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.parse.OliveImporter

/** Distributed Olive import (same shape as [[LuxImportJob]]). */
object OliveImportJob {

  case class ImportResult(
      issueId: String,
      issueJson: Option[String],
      pages: Seq[(String, String)],
      error: Option[String])

  def run(spark: SparkSession, baseDir: String,
      cdt: String, ts: String): Dataset[ImportResult] = {
    import spark.implicits._
    val refs = OliveImporter.detectIssues(baseDir)
    val parallelism = math.max(1, math.min(refs.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(refs)
      .repartition(parallelism)
      .map { ref =>
        try {
          val p = OliveImporter.parseIssue(ref, cdt, ts)
          ImportResult(p.issueId, Some(p.issueJson), p.pageJsons, None)
        } catch {
          case e: Exception =>
            ImportResult(ref.issueId, None, Nil,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
  }

  def quarantine(results: Dataset[ImportResult]): DataFrame = {
    import results.sparkSession.implicits._
    results.flatMap(r => r.error.map(e => (r.issueId, e)))
      .toDF("issue_id", "error")
  }
}
