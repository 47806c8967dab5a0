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

  /** Gap fill / resample: the dense per-user time grid at fixed
    * `widthUs`-microsecond buckets between each user's first and last
    * event, with the bucket's event count and the forward-filled last
    * observation (the classic time-series densify: a dashboard or
    * feature pipeline wants a value for EVERY interval, not just the
    * ones that happened to see an event).
    *
    * Per bucket: `n` = events that fell in it (0 for generated gap
    * rows), `fill_e6` = the latest observed `value` at-or-before
    * the bucket (argmax by event_id inside a bucket — unique, so
    * deterministic — then `last(_, ignoreNulls)` carried along the
    * per-user ordered frame), shipped as a floor(x·1e6) bigint cut:
    * the previous decimal(18,2) cast landed on .5 rounding ties
    * where Spark and DuckDB disagree (the exact pathology measured
    * for [[resampleInterp]]'s lerp_e6 — 113/105k rows at sf0.01),
    * while the e6 floor of the SAME IEEE double is
    * engine-independent. `bucket` is the integer epoch-index
    * (epoch_us div widthUs) — bigint out, never a raw timestamp.
    *
    * Scale shape: one (user, bucket) partial-agg shuffle compacts raw
    * events to at most one row per occupied bucket BEFORE anything
    * else; the grid explode is output-driven (span/width rows per
    * user, exactly the rows the caller asked to materialize); the
    * forward-fill window sorts per user AFTER the compaction, so its
    * partition size is bounded by the user's bucket span — by the
    * grid's own definition of output — never by raw event volume. */
  def resampleFill(events: DataFrame,
      widthUs: Long = 3600000000L): DataFrame = {
    require(widthUs > 0, "widthUs must be positive")
    val a = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${widthUs}L").as("bucket"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), col("event_id")).as("lv"))
    val grid = a.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val fillW = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(a, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        floor(last(col("lv"), ignoreNulls = true).over(fillW) *
          lit(1000000.0)).cast("bigint").as("fill_e6"))
  }

  /** Linear-interpolation resample — [[resampleFill]]'s smooth
    * sibling: the same dense per-user grid, but gap buckets take the
    * straight line between the surrounding observations instead of a
    * step (prev + (next − prev) · (g − prevB)/(nextB − prevB)), the
    * other half of every resampling library's fill repertoire.
    *
    * Same plan shape as [[resampleFill]] plus one more window pass:
    * the backward (next-observation) carry runs over the SAME
    * (user, bucket) sort as the forward one — two Window nodes, one
    * exchange, one sort. The grid's ends are observations by
    * construction, so prev/next are always defined; an observed
    * bucket interpolates to itself (ratio 0). The interpolated value
    * ships as an e6 FLOOR cut (`lerp_e6`): interpolation ratios are
    * small rationals (j/gap over 2-dp endpoints), so the usual
    * decimal cut lands on exact .5e-6 ties where engines disagree on
    * the rounding mode (measured: 113/105k rows at sf0.01);
    * floor(x·1e6) of the SAME IEEE double is engine-independent. */
  def resampleInterp(events: DataFrame,
      widthUs: Long = 3600000000L): DataFrame = {
    require(widthUs > 0, "widthUs must be positive")
    val a = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${widthUs}L").as("bucket"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), col("event_id")).as("lv"))
    val grid = a.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val byBucket = Window.partitionBy(col("user_id"))
      .orderBy(col("bucket"))
    val back = byBucket
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byBucket
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("lv").isNotNull, col("bucket"))
    val lerped = grid.join(a, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("lv"), ignoreNulls = true).over(back).as("pv"),
        last(obsBucket, ignoreNulls = true).over(back).as("pb"),
        first(col("lv"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsBucket, ignoreNulls = true).over(fwd).as("nb"))
    val lerp = when(col("nb") === col("pb"), col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) *
        (col("bucket") - col("pb")).cast("double") /
        (col("nb") - col("pb")).cast("double"))
    lerped.select(col("user_id"), col("bucket"), col("n"),
      floor(lerp * lit(1000000.0)).cast("bigint").as("lerp_e6"))
  }
}
