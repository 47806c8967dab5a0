package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Manifest sink (SURVEY.md §2.1 S12): the per-stage data manifest the
  * reference accumulates per (title, year) and exports as JSON
  * (core.py:419-426 add_count_list_by_title_year, core.py:512-518 /
  * rebuilder.py:402-436 compute+export; the DataManifest class itself
  * lives in the external impresso_essentials package).
  *
  * Spark-first shape: the manifest IS the stats DataFrame
  * ([[Stats.canonicalStats]] / [[Stats.rebuiltStats]]) — the driver-side
  * mutable accumulator the reference threads through its bag pipeline
  * is replaced by one aggregation over the output, written as a
  * partitioned JSON dataset plus a single overall document. Git export
  * is out of scope (SURVEY.md §2.1 S12).
  */
object Manifest {

  /** Nest yearly stat rows into one manifest row per alias:
    * (alias, media_stats: [{year, ...counts}], totals). */
  def byTitle(stats: DataFrame): DataFrame = {
    val countCols = stats.columns.filterNot(Seq("alias", "year").contains)
    stats.groupBy(col("alias"))
      .agg(
        sort_array(collect_list(struct(col("year") +:
          countCols.map(col): _*))).as("media_stats"),
        countCols.map(c => sum(col(c)).as(s"total_$c")): _*)
  }

  /** Write the manifest: one JSON line per title (partition-friendly at
    * any title count), overwrite semantics for idempotent re-runs. */
  def write(stats: DataFrame, outPath: String): Unit =
    byTitle(stats)
      .repartition(col("alias"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("alias")
      .json(outPath)
}
