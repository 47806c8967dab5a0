package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate, MERGEABLE forms of the profiling aggregates — what
  * replaces a6 (exact distinct) and a11 (exact percentile) when group
  * cardinality is unbounded at 100 TB. Sketch state is bounded and
  * merges associatively (HyperLogLog++ registers; t-digest-style
  * quantile summaries), so both stay one partial-aggregated shuffle
  * with fixed-size buffers — no per-group sort, no exact distinct set.
  *
  * These cannot be DuckDB-oracle-checked (the sketch algorithms
  * differ between engines by design), so the gate is accuracy against
  * the EXACT form on the same data, with the documented error bounds.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx_count_distinct tracks exact distinct within its rsd bound") {
    val li = graft.util.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey")).as("d"))
      .head().getLong(0)
    val approx = li.select(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("d"))
      .head().getLong(0)
    // 2% rsd → allow 4 sigma
    assert(math.abs(approx - exact) <= 0.08 * exact + 1,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact per-group medians") {
    val li = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("q"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("q"), lit(0.5), lit(1000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      // quantity is 1..50; accuracy 1000 keeps the approx within a
      // couple of adjacent values of the true median
      assert(math.abs(approx(k) - m) <= 2.0, s"$k: ${approx(k)} vs $m")
    }
  }

  test("sketches partial-aggregate (mergeable map-side state)") {
    val li = graft.util.Tables.lineitem(spark, sf)
    val p = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("d"))
      .queryExecution.executedPlan.toString
    val hits = "HashAggregate|ObjectHashAggregate".r.findAllIn(p).length
    assert(hits >= 2, "sketch aggregation is not partial/final\n" + p.take(1500))
  }
}
