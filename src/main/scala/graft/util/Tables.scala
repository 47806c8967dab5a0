package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md) plus
  * shared numeric conventions used to keep Spark results bit-identical to
  * the DuckDB oracle.
  *
  * Convention: money-like doubles are cast to DECIMAL(18,2) *before*
  * aggregation in both engines. Double summation is order-dependent (Spark
  * partial aggs vs DuckDB's scan order would differ in final ulps), while
  * decimal arithmetic is exact and associative, so sums hash-match. Derived
  * ratios are computed as double divisions of those exact values — a single
  * IEEE-754 op on identical inputs is deterministic in both engines.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses to read
    * as a timestamp. Read nanos as long and truncate to micros — exactly
    * what DuckDB does internally (its timestamps are micro-precision), so
    * oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact money: DECIMAL(18,2). Matches DuckDB `CAST(x AS DECIMAL(18,2))`. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
}
