package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rebuild.RebuildJob
import graft.util.Tables

/** Oracle-checked coverage for the rebuild stage (SURVEY.md §2.9).
  *
  * The rebuild consumes canonical issues/pages, not the TPC-ish tables —
  * so these queries first synthesize canonical-shaped issues and pages
  * FROM `documents` (one single-line, single-region page per document),
  * run the full RebuildJob machinery (explode → join → region filter →
  * group → typed fold), and emit fields DuckDB can recompute directly
  * from `documents`: for a single-line page the rebuilt fulltext is
  * exactly the whitespace tokens joined by single spaces plus a trailing
  * space (solr) or newline (passim).
  */
object RebuildQueries {

  private def issueId: Column =
    concat(lit("D"), col("doc_id"), lit("-2000-01-01-a"))
  private def ciId: Column = concat(issueId, lit("-i0001"))

  private def box: Column = array(lit(0), lit(0), lit(1), lit(1))

  /** Canonical-shaped issues frame derived from `documents`. */
  def syntheticIssues(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      issueId.as("id"),
      lit(null).cast("string").as("st"),
      lit(null).cast("string").as("sm"),
      array(struct(struct(
        ciId.as("id"),
        lit("article").as("tp"),
        array(lit(1)).as("pp"),
        lit(null).cast("string").as("lg"),
        lit(null).cast("string").as("l"),
        lit(null).cast("string").as("t"),
        lit(null).cast("int").as("ro"),
        lit(null).cast("string").as("iiif_link")).as("m"))).as("i"))

  /** Canonical-shaped pages frame: one region/para/line holding the
    * document's whitespace tokens. */
  def syntheticPages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      concat(issueId, lit("-p0001")).as("id"),
      lit(true).as("cc"),
      array(struct(
        box.as("c"),
        ciId.as("pOf"),
        array(struct(
          box.as("c"),
          array(struct(
            box.as("c"),
            transform(split(trim(col("text")), "\\s+"), t => struct(
              box.as("c"),
              t.as("tx"),
              lit(null).cast("int").as("s"),
              lit(null).cast("boolean").as("hy"),
              lit(null).cast("string").as("nf"),
              lit(null).cast("boolean").as("gn"))).as("t"))).as("l"))).as("p")))
        .as("r"))

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1/R2/R3/R5 — full solr rebuild pipeline over synthesized canonical
    // data (rejoin, region join, fold, assembly)
    "r3_rebuild_solr" -> ((s, d) => {
      RebuildJob.rebuildSolr(s, syntheticIssues(s, d), syntheticPages(s, d),
        ts = "2020-01-01T00:00:00Z")
        .toDF()
        .select(col("id"), col("ft"),
          size(element_at(col("ppreb"), 1).getField("t")).as("n_spans"),
          element_at(col("lb"), -1).as("last_lb"),
          col("d"), col("ro"), col("olr"), col("cc"))
        .orderBy(col("id"))
    }),

    // R6/R7 — passim-format rebuild (newline line ends)
    "r6_rebuild_passim" -> ((s, d) => {
      RebuildJob.rebuildPassim(s, syntheticIssues(s, d), syntheticPages(s, d))
        .toDF()
        .select(col("id"), col("series"), col("date"), col("tp"),
          col("text"), size(element_at(col("pages"), 1).getField("regions"))
            .as("n_regions"))
        .orderBy(col("id"))
    })
  )

  val sql: Map[String, String] = Map(
    "r3_rebuild_solr" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents)
        |SELECT 'D' || CAST(doc_id AS VARCHAR) || '-2000-01-01-a-i0001' AS id,
        |  array_to_string(tk, ' ') || ' ' AS ft,
        |  CAST(len(tk) AS INT) AS n_spans,
        |  CAST(length(array_to_string(tk, ' ')) AS INT) AS last_lb,
        |  '2000-01-01' AS d, 1 AS ro, true AS olr, true AS cc
        |FROM toks ORDER BY id""".stripMargin,

    "r6_rebuild_passim" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents)
        |SELECT 'D' || CAST(doc_id AS VARCHAR) || '-2000-01-01-a-i0001' AS id,
        |  'D' || CAST(doc_id AS VARCHAR) AS series,
        |  '2000-01-01' AS date, 'ar' AS tp,
        |  array_to_string(tk, ' ') || chr(10) AS text,
        |  CAST(len(tk) AS INT) AS n_regions
        |FROM toks ORDER BY id""".stripMargin
  )
}
