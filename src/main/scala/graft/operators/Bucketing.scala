package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout: pay one shuffle at WRITE time so that every
  * subsequent equi-join or aggregation on the bucket key pays none.
  *
  * At 100 TB the dominant cost of a repeatedly-joined fact table is
  * re-shuffling it per query. Bucketing persists the hash partitioning
  * into the table layout (Murmur3 on the bucket column, `nBuckets`
  * ways): a join of two tables bucketed on their join keys with equal
  * bucket counts reads co-located buckets directly — the planner
  * recognizes the stored `HashPartitioning` and drops BOTH shuffle
  * exchanges (gated by BucketingSpec against the executed plan). The
  * reference materializes its canonical tables once and queries them
  * many times (e.g. rebuilt/pages stores re-read per job,
  * impresso-text-acquisition text_preparation/rebuild.py write-once
  * read-many layout); this is the Spark-native layout for that
  * pattern.
  *
  * Sizing: `nBuckets` is the at-rest parallelism AND the per-join
  * partition count — pick `tableBytes / nBuckets` near the executor
  * target split (128–512 MB), and keep bucket counts equal (or
  * integer multiples, with `spark.sql.bucketing.coalesceBucketsInJoin
  * .enabled`) across tables that join together.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and optionally sorted)
    * by `key`. The frame is pre-repartitioned by the SAME hash
    * expression the bucketing spec uses, so each bucket lands as ONE
    * file: no small-files explosion (output is exactly `nBuckets`
    * files regardless of input task count), and per-bucket sort
    * metadata stays usable for merge joins. */
  /** Drop `table` AND its warehouse location: a previous session's
    * table directory is invisible to this (in-memory) catalog but
    * still fails CTAS with LOCATION_ALREADY_EXISTS. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    dropTableAndLocation(spark, table)
    val writer = df.repartition(nBuckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*)
     else writer).saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket keys — zero
    * exchanges when bucket counts match (the write-time shuffle is
    * amortized over every such join). Key columns may differ in name;
    * each side's join key must be its bucket column. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
