package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manifest statistics (SURVEY.md §2.4 A2/A3): the per-(alias, year)
  * aggregates the reference computes for its DataManifest
  * (core.py:419-426 canonical stats; rebuilder.py:46 + compute_stats_in
  * _rebuilt_bag for rebuilt stats).
  *
  * One `groupBy` each — partial aggregation (map-side combine) comes free
  * from Catalyst, which is exactly what the reference hand-rolls with
  * Dask tree reductions.
  */
object Stats {

  private def aliasOf(id: Column): Column =
    regexp_extract(id, "^([^-]+)-", 1)
  private def yearOf(id: Column): Column =
    regexp_extract(id, "-(\\d{4})-", 1).cast("int")

  /** Canonical stats over an issues frame (id, pp, i):
    * issues, content items, images, distinct pages per (alias, year). */
  def canonicalStats(issues: DataFrame): DataFrame =
    issues
      .groupBy(aliasOf(col("id")).as("alias"), yearOf(col("id")).as("year"))
      .agg(
        count(lit(1)).as("n_issues"),
        sum(size(col("i"))).as("n_content_items"),
        sum(size(filter(col("i"), ci => ci.getField("m").getField("tp") === "image")))
          .as("n_images"),
        sum(size(array_distinct(col("pp")))).as("n_pages"))

  /** Rebuilt stats over a rebuilt (solr) frame (id, ft):
    * content items, fulltext characters, whitespace tokens. */
  def rebuiltStats(rebuilt: DataFrame): DataFrame =
    rebuilt
      .groupBy(aliasOf(col("id")).as("alias"), yearOf(col("id")).as("year"))
      .agg(
        count(lit(1)).as("n_cis"),
        sum(length(coalesce(col("ft"), lit("")))).as("n_chars"),
        sum(when(col("ft").isNull || col("ft") === "", 0)
          .otherwise(size(split(trim(col("ft")), "\\s+")))).as("n_tokens"))
}
