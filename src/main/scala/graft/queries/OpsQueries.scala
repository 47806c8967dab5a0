package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Geometry, Iiif}
import graft.operators.{EventOps, Stats}
import graft.rebuild.RebuildJob
import graft.util.Tables

/** Oracle coverage for event-time operators (tumbling windows,
  * sessionization), manifest statistics (A2/A3) and the geometry / IIIF
  * scalar functions (C4–C7, C16–C17).
  */
object OpsQueries {

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1 — tumbling-window aggregation (batch form; streaming form in
    // graft.streaming.EventStream shares the window rule)
    "e1_window_agg" -> ((s, d) => {
      EventOps.tumblingAgg(Tables.events(s, d), "1 hour")
        .orderBy(col("w_start"), col("event_type"))
    }),

    // E2 — gap-based sessionization (30-minute gap)
    "e2_sessionize" -> ((s, d) => {
      EventOps.sessionize(Tables.events(s, d), 30)
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // E4 — stream-static enrichment (batch form; the streaming form in
    // EventStream.enrich broadcast-joins each micro-batch against the
    // same static dimension, verified equivalent in StreamingSpec)
    "e4_stream_enrich" -> ((s, d) => {
      graft.streaming.EventStream.enrich(
        Tables.events(s, d), Tables.customer(s, d),
        "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("c_mktsegment"),
          col("event_type"))
        .orderBy(col("event_id"))
    }),

    // J11 — AS-OF join, Spark-first: for each purchase, the latest
    // strictly-earlier click by the same user. No range join, no pair
    // explosion: one shuffle by user, one sort, then last-non-null
    // window carries the most recent click forward — O(1) state per
    // row, the same plan shape at 10^6 or 10^12 events. (A naive
    // ts-range join explodes to |purchases|x|clicks| per user before
    // filtering; this never materializes a pair.)
    "j11_asof_join" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isClick = col("event_type") === "click"
      e.withColumn("click_us",
          last(when(isClick, col("us")), ignoreNulls = true).over(w))
        .withColumn("click_id",
          last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"),
          col("click_id"), col("click_us"))
        .orderBy(col("event_id"))
    }),

    // W9 — sliding RANGE frame: events in the user's trailing 5
    // minutes. This is the range-join shape (event x events within
    // [ts-5m, ts]) WITHOUT the join: a range frame over the sorted
    // partition keeps a two-pointer window — each row enters and
    // leaves the frame once, O(n) per user total, versus a range
    // self-join's O(n·k) materialized pairs
    "w9_range_count" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("n_5min", count(lit(1)).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"))
            .rangeBetween(-300000000L, 0)))
        .orderBy(col("event_id"))
    }),

    // A13 — robust per-type outlier screen: median + MAD (median
    // absolute deviation) per event_type and the count of events
    // beyond 3 MADs. The robust pair shrugs off the very outliers a
    // mean/stddev screen absorbs into its own threshold; two exact
    // grouped percentiles (the a11 machinery) + two broadcast joins
    // of a 5-row stats dim — no second shuffle of the events.
    "a13_robust_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("value").cast("double").as("v"))
      val med = ev.groupBy(col("event_type"))
        .agg(percentile(col("v"), lit(0.5)).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("med"),
          abs(col("v") - col("med")).as("ad"))
      val mad = dev.groupBy(col("event_type"))
        .agg(percentile(col("ad"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("ad") > lit(3.0) * col("mad"), lit(1L))
            .otherwise(lit(0L))).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // W10 — gap fill / resample: dense hourly grid per user between
    // first and last event, zero-count gap rows, forward-filled last
    // observation. The time-series densify every dashboard/feature
    // pipeline needs; bucket is the integer epoch-hour (no raw
    // timestamp out).
    "w10_gap_fill" -> ((s, d) => {
      EventOps.resampleFill(Tables.events(s, d))
        .orderBy(col("user_id"), col("bucket"))
    }),

    // W11 — linear-interpolation resample: w10's grid with gap
    // buckets on the straight line between surrounding observations
    // (the other half of the resampling repertoire; e6 decimal cut).
    "w11_lerp_fill" -> ((s, d) => {
      EventOps.resampleInterp(Tables.events(s, d))
        .orderBy(col("user_id"), col("bucket"))
    }),

    // E5 — interval join (batch form; the streaming form in
    // EventStream.intervalJoin is a watermarked stream-stream join over
    // the same predicate, verified equivalent in StreamingSpec)
    "e5_interval_join" -> ((s, d) => {
      EventOps.intervalJoin(Tables.events(s, d), windowHours = 6)
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // E3 — idempotent-ingestion dedup by event id (batch form of the
    // streaming EventStream.dedupEvents; the doubled input simulates an
    // at-least-once source re-delivering every event)
    "e3_event_dedup" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      e.union(e).dropDuplicates("event_id")
        .orderBy(col("event_id"))
    }),

    // A2 — canonical manifest stats per (alias, year)
    "a2_canonical_stats" -> ((s, d) => {
      Stats.canonicalStats(RebuildQueries.syntheticIssues(s, d))
        .orderBy(col("alias"), col("year"))
    }),

    // A3 — rebuilt manifest stats per (alias, year)
    "a3_rebuilt_stats" -> ((s, d) => {
      val rebuilt = RebuildJob.rebuildSolr(s,
        RebuildQueries.syntheticIssues(s, d),
        RebuildQueries.syntheticPages(s, d), ts = "T").toDF()
      Stats.rebuiltStats(rebuilt).orderBy(col("alias"), col("year"))
    }),

    // C4 — xywh↔xyxy conversions, enclosing box, area, IoU
    "c4_geometry" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"),
        array((col("p_partkey") % 100).cast("int"), col("p_size"),
          (col("p_size") * 2 + 1).cast("int"),
          ((col("p_partkey") % 50) + 1).cast("int")).as("box"))
      p.select(
        col("p_partkey"),
        Geometry.xywhToXyxy(col("box")).as("xyxy"),
        Geometry.xyxyToXywh(Geometry.xywhToXyxy(col("box"))).as("roundtrip"),
        Geometry.area(col("box")).as("area"),
        Geometry.enclosingBox(array(col("box"),
          Geometry.xywhToXyxy(col("box")))).as("enclosing"),
        Geometry.iou(col("box"), col("box")).as("self_iou"))
        .select(col("p_partkey"),
          concat_ws(",", col("xyxy")).as("xyxy"),
          concat_ws(",", col("roundtrip")).as("roundtrip"),
          col("area"),
          concat_ws(",", col("enclosing")).as("enclosing"),
          col("self_iou"))
        .orderBy(col("p_partkey"))
    }),

    // C5 — rescale with truncation (the /254 resolution conversion shape)
    "c5_rescale" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"),
        array((col("p_partkey") % 100).cast("int"), col("p_size"),
          (col("p_size") * 2 + 1).cast("int"),
          ((col("p_partkey") % 50) + 1).cast("int")).as("box"))
      p.select(col("p_partkey"),
        concat_ws(",", Geometry.rescale(col("box"), lit(300), lit(254)))
          .as("rescaled"))
        .orderBy(col("p_partkey"))
    }),

    // C16/C17 — IIIF link construction with endpoint-specific suffixes
    "c16_iiif_links" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(expr("doc_id % 3 = 0"),
          concat(lit("https://ub-sipi.ub.unibas.ch/impresso/"), col("source")))
          .when(expr("doc_id % 3 = 1"),
            concat(lit("https://scriptorium.bcu-lausanne.ch/api/"), col("source")))
          .otherwise(concat(lit("https://example.org/iiif/"), col("source")))
          .as("base"),
        array(expr("cast(doc_id % 50 as int)"), lit(10),
          expr("cast(n_chars % 300 as int)"), lit(40)).as("coords"))
      docs.select(col("doc_id"),
        Iiif.imageLink(col("base"), col("coords")).as("img_link"),
        Iiif.infoLink(col("base")).as("info_link"),
        Iiif.encodeArk(concat(lit("ark:/70795/"), col("doc_id"))).as("ark"))
        .orderBy(col("doc_id"))
    })
  )

  val sql: Map[String, String] = Map(
    "e1_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e3_event_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "e4_stream_enrich" ->
      """SELECT event_id, user_id, c_mktsegment, event_type
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "e5_interval_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) AS purchase_us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id,
        |    epoch_us(ts) AS click_us FROM events
        |  WHERE event_type = 'click')
        |SELECT purchase_id, p.user_id AS user_id, click_id,
        |  purchase_us - click_us AS lag_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.click_us BETWEEN p.purchase_us - 21600000000
        |    AND p.purchase_us
        |ORDER BY purchase_id, click_id""".stripMargin,

    "w9_range_count" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_5min
        |FROM events ORDER BY event_id""".stripMargin,

    "a13_robust_outliers" ->
      """WITH s AS (
        |  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
        |m AS (
        |  SELECT event_type, quantile_cont(v, 0.5) AS med
        |  FROM s GROUP BY 1),
        |d AS (
        |  SELECT s.event_type, med, abs(v - med) AS ad
        |  FROM s JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(med) AS med, max(mad) AS mad,
        |  CAST(sum(CASE WHEN ad > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w10_gap_fill" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
        |    event_id, value
        |  FROM events),
        |a AS (
        |  SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n,
        |    arg_max(value, event_id) AS lv
        |  FROM b GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
        |  FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |        FROM a GROUP BY 1)),
        |j AS (
        |  SELECT g.user_id, g.bucket, coalesce(a.n, 0) AS n, a.lv
        |  FROM g LEFT JOIN a USING (user_id, bucket))
        |SELECT user_id, bucket, n,
        |  CAST(floor(last_value(lv IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    * 1000000) AS BIGINT) AS fill_e6
        |FROM j ORDER BY user_id, bucket""".stripMargin,

    "w11_lerp_fill" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
        |    event_id, value
        |  FROM events),
        |a AS (
        |  SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n,
        |    arg_max(value, event_id) AS lv
        |  FROM b GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
        |  FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |        FROM a GROUP BY 1)),
        |j AS (
        |  SELECT g.user_id, g.bucket, coalesce(a.n, 0) AS n, a.lv,
        |    CASE WHEN a.lv IS NOT NULL THEN g.bucket END AS ob
        |  FROM g LEFT JOIN a USING (user_id, bucket)),
        |w AS (
        |  SELECT user_id, bucket, n,
        |    last_value(lv IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(ob IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        |    first_value(lv IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(ob IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM j)
        |SELECT user_id, bucket, n,
        |  CAST(floor((CASE WHEN nb = pb THEN pv
        |      ELSE pv + (nv - pv) * CAST(bucket - pb AS DOUBLE)
        |        / CAST(nb - pb AS DOUBLE) END) * 1000000.0) AS BIGINT)
        |    AS lerp_e6
        |FROM w ORDER BY user_id, bucket""".stripMargin,

    "j11_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events)
        |SELECT event_id, user_id, us, click_id, click_us FROM (
        |  SELECT event_id, user_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_us,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id
        |  FROM e)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "e2_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
        |        THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |        AS session_idx FROM y)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts
        |FROM z GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "a2_canonical_stats" ->
      s"""SELECT 'D' || CAST(doc_id % 20 AS VARCHAR) AS alias,
         |  CAST(year(DATE '2000-01-01' + CAST(doc_id // 20 AS INT)) AS INT) AS year,
         |  count(*) AS n_issues,
         |  CAST(2 * count(*) AS BIGINT) AS n_content_items,
         |  CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
         |  CAST(count(*) AS BIGINT) AS n_pages
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a3_rebuilt_stats" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
         |  FROM documents)
         |SELECT 'D' || CAST(doc_id % 20 AS VARCHAR) AS alias,
         |  CAST(year(DATE '2000-01-01' + CAST(doc_id // 20 AS INT)) AS INT) AS year,
         |  CAST(2 * count(*) AS BIGINT) AS n_cis,
         |  CAST(SUM(length(array_to_string(tk, ' ')) + 1) AS BIGINT) AS n_chars,
         |  CAST(SUM(len(tk)) AS BIGINT) AS n_tokens
         |FROM toks GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c4_geometry" ->
      """WITH b AS (
        |  SELECT p_partkey,
        |    [CAST(p_partkey % 100 AS INT), p_size,
        |     CAST(p_size * 2 + 1 AS INT), CAST(p_partkey % 50 + 1 AS INT)] AS box
        |  FROM part),
        |x AS (SELECT p_partkey, box,
        |  [box[1], box[2], box[1] + box[3], box[2] + box[4]] AS xyxy FROM b)
        |SELECT p_partkey,
        |  array_to_string(xyxy, ',') AS xyxy,
        |  array_to_string([xyxy[1], xyxy[2], xyxy[3] - xyxy[1], xyxy[4] - xyxy[2]], ',') AS roundtrip,
        |  CAST(box[3] * box[4] AS INT) AS area,
        |  array_to_string([least(box[1], xyxy[1]), least(box[2], xyxy[2]),
        |    greatest(box[1] + box[3], xyxy[1] + xyxy[3]) - least(box[1], xyxy[1]),
        |    greatest(box[2] + box[4], xyxy[2] + xyxy[4]) - least(box[2], xyxy[2])], ',') AS enclosing,
        |  CAST(1.0 AS DOUBLE) AS self_iou
        |FROM x ORDER BY p_partkey""".stripMargin,

    "c5_rescale" ->
      """SELECT p_partkey,
        |  array_to_string(list_transform(
        |    [CAST(p_partkey % 100 AS INT), p_size,
        |     CAST(p_size * 2 + 1 AS INT), CAST(p_partkey % 50 + 1 AS INT)],
        |    v -> CAST(trunc(CAST(v AS DOUBLE) * 300 / 254) AS INT)), ',') AS rescaled
        |FROM part ORDER BY p_partkey""".stripMargin,

    "c16_iiif_links" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 3 = 0 THEN 'https://ub-sipi.ub.unibas.ch/impresso/' || source
        |         WHEN doc_id % 3 = 1 THEN 'https://scriptorium.bcu-lausanne.ch/api/' || source
        |         ELSE 'https://example.org/iiif/' || source END AS base
        |  FROM documents)
        |SELECT doc_id,
        |  base || '/' || CAST(doc_id % 50 AS INT) || ',' || 10 || ',' ||
        |    CAST(n_chars % 300 AS INT) || ',' || 40 || '/' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'max/0/default.jpg'
        |         WHEN doc_id % 3 = 1 THEN '300,/0/default.jpg'
        |         ELSE 'full/0/default.jpg' END AS img_link,
        |  base || '/info.json' AS info_link,
        |  'ark:%2f70795%2f' || CAST(doc_id AS VARCHAR) AS ark
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
