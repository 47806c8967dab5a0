package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local measurement harness (test scope, not shipped): the skewed
  * shuffle join under (a) plain sort-merge with AQE off, (b) AQE
  * skew-join splitting, (c) explicit salting sized by
  * [[graft.operators.Skew.chooseSalts]]. Numbers land in BENCH_NOTES
  * and the Skew scaladoc so the "when to use which" guidance carries
  * measurements. Run with `sbt "Test/runMain graft.SkewScratch"`. */
object SkewScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBig = sys.env.getOrElse("SKEW_BIG", "20000000").toLong
    val nSmall = sys.env.getOrElse("SKEW_SMALL", "200000").toLong
    // 40% of the big side lands on key 0; the rest is uniform
    val big = spark.range(nBig).select(
      when(col("id") % 10 < 4, 0L)
        .otherwise(pmod(hash(col("id")), lit(nSmall)).cast("long"))
        .as("k"),
      col("id").as("payload"))
    val small = spark.range(nSmall).select(
      col("id").as("sk"), (col("id") * 7).as("w"))

    // keep the dim un-broadcastable so every variant really shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SKEW $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("w").agg(sum("payload")).count()

    // warmup both sides
    big.count(); small.count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("plain, AQE off")(
        agg(big.join(small, col("k") === col("sk"))))

      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      time("plain, AQE skew-join")(
        agg(big.join(small, col("k") === col("sk"))))

      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val n = graft.operators.Skew.chooseSalts(big, "k",
        targetRowsPerTask = nBig / 32)
      time(s"salted (auto n=$n)")(
        agg(graft.operators.Skew.saltedJoin(big, small, "k", "sk",
          col("payload"), n)))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
