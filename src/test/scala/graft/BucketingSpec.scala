package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed layout: the write-time shuffle must buy shuffle-FREE joins
  * afterwards, and the layout must not explode into small files. */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def withTables[A](names: String*)(body: => A): A =
    try body finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("join of two co-bucketed tables runs with zero shuffle exchanges") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    withTables("bkt_lineitem", "bkt_orders") {
      Bucketing.writeBucketed(lineitem, "bkt_lineitem", "l_orderkey", 8,
        Seq("l_orderkey"))
      Bucketing.writeBucketed(orders, "bkt_orders", "o_orderkey", 8,
        Seq("o_orderkey"))
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // force a merge join: broadcast would hide the exchange question
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = Bucketing.bucketedJoin(spark,
          "bkt_lineitem", "bkt_orders", "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")).as("qty"))
        joined.collect()
        val shuffles = collect(joined.queryExecution.executedPlan) {
          case s: ShuffleExchangeExec => s
        }
        // both join inputs read pre-hashed buckets, and the groupBy
        // still needs its own exchange — exactly one shuffle, vs three
        // for the unbucketed formulation
        assert(shuffles.length == 1,
          s"expected only the aggregation exchange, got ${shuffles.length}:\n" +
            joined.queryExecution.executedPlan)

        // same rows as the plain parquet join
        val expected = lineitem
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")).as("qty"))
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        val got = joined.collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSet
        assert(got == expected)
      } finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed write lands exactly one file per bucket") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    withTables("bkt_files") {
      Bucketing.writeBucketed(orders, "bkt_files", "o_orderkey", 8)
      val loc = spark.sql("DESCRIBE TABLE EXTENDED bkt_files")
        .filter(col("col_name") === "Location")
        .first().getString(1).stripPrefix("file:")
      val files = new java.io.File(loc).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      // pre-repartitioning by the bucket hash keeps task boundaries
      // aligned with buckets: nBuckets files total, no small-file fanout
      // (input tasks x buckets files is what an unaligned write emits)
      assert(files.length == 8,
        s"expected 8 bucket files, got ${files.length}")
      // the table round-trips
      assert(spark.table("bkt_files").count() == orders.count())
    }
  }
}
