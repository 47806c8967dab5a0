package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables.dec

/** Event-time operators over the `events` table: tumbling-window
  * aggregation and gap-based sessionization.
  *
  * The reference is batch-only (SURVEY.md §2.10) — these are the
  * streaming-friendly operators the engine adds. The batch forms here
  * share semantics with [[graft.streaming.EventStream]]'s incremental
  * forms: same windows, same gap rule, so a backfill and a live stream
  * agree.
  */
object EventOps {

  /** Tumbling-window counts/sums per event type. `slide == width` ⇒ one
    * shuffle keyed by (window, type); at 100 TB the window key prefix
    * keeps partitions time-local so AQE can coalesce cold windows. */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Purchase→click attribution interval join: every purchase paired
    * with the same user's clicks in the trailing `windowHours`. One
    * shuffle keyed by user on each side, then a sort-merge join whose
    * per-user fan-out is bounded by click-rate × window — the pair set
    * never exceeds Σ_user purchases·clicks-in-window, so output (not
    * input) size is the cost driver at 100 TB. The streaming form
    * ([[graft.streaming.EventStream.intervalJoin]]) shares this exact
    * predicate; its state is the same click window, aged out by the
    * watermark. */
  def intervalJoin(events: DataFrame, windowHours: Int): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
    p.join(c, intervalJoinCond(windowHours))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** The shared interval-join predicate: same user, click in
    * `[purchase_ts - windowHours, purchase_ts]`. Column names are the
    * `intervalJoin` projections on both the batch and streaming side. */
  private[graft] def intervalJoinCond(windowHours: Int): Column =
    col("user_id") === col("click_user") &&
      col("click_ts") >= col("purchase_ts") -
        expr(s"INTERVAL $windowHours HOURS") &&
      col("click_ts") <= col("purchase_ts")

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event of the same user exceeds `gapMinutes`. One row per
    * session. Two window passes over the same (user_id, ts) ordering —
    * one shuffle total, both windows reuse the partitioning. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val withFlag = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs).cast("int"))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withFlag
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"))
  }
}
