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
  /** `events.ts` arrives in driver-generation-dependent physical types:
    * parquet TIMESTAMP(NANOS) (Spark refuses to read it as a timestamp —
    * read nanos as long, truncate to micros) or plain micros (pandas
    * writes tz-naive → Spark reads TIMESTAMP_NTZ). Both normalize to a
    * micro-precision UTC TimestampType column — exactly how DuckDB holds
    * them (micro-precision, tz-naive read as UTC; session tz is UTC in
    * every entrypoint), so oracle comparisons line up either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // an unexpected physical type (a future regeneration) should be
        // visible, not silently compared against the oracle
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"events.ts has unexpected physical type $other — passing " +
            "through unnormalized; oracle comparisons may diverge")
        df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact money: DECIMAL(18,2). Matches DuckDB `CAST(x AS DECIMAL(18,2))`. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
}
