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

  /** Parallelize an unsplittable-input scan before EXPENSIVE per-row
    * work — the guide §2.5 input-skew remedy ("one huge unsplittable
    * file … repartition immediately after the read"). The driver's
    * parquet tables are single-row-group files, so a scan is ONE task
    * no matter the split config; every per-row-costly operator
    * (shingle+md5, char-LM counts, gram hashing, image/audio codecs)
    * was single-threading its most expensive stage on a 32-core
    * session. A deterministic hash repartition on `key` (never
    * round-robin — re-run tasks must reproduce the same placement,
    * SPARK-23207/SPARK-38388) spreads the rows across the session's
    * default parallelism.
    *
    * Self-adapting, not a config: when the frame already carries at
    * least the session's parallelism (the production case — large
    * inputs arrive as many splits), this is a NO-OP and no exchange
    * is added. Call it only on scan-rooted frames (the partition
    * probe plans the frame; exchange-free plans plan without running
    * jobs).
    */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe the split count from file-index metadata when the frame is
    // scan-rooted (the common case here) — the `df.rdd` fallback plans
    // the whole query physically and instantiates its RDD, a pure
    // driver tax per invocation that grows with input file count at
    // production scale
    val partitions = org.apache.spark.sql.GraftScans.scanSplitEstimate(df)
      .getOrElse(df.rdd.getNumPartitions.toLong)
    if (partitions >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }
}
