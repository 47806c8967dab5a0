package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.util.Tables.dec

/** Structured-Streaming forms of the event operators.
  *
  * The reference has no streaming (SURVEY.md §2.10); its closest analog —
  * incremental import — maps to a file stream with checkpointed tracking.
  * These operators give the engine genuine incremental semantics:
  * watermarked tumbling windows and stateful sessionization via
  * `flatMapGroupsWithState`, sharing window/gap rules with the batch
  * forms in [[graft.operators.EventOps]].
  */
// Serializable: the flatMapGroupsWithState update closures call the
// shared foldGap, so tasks capture this (stateless) module reference
// — the TriangleStream convention
object EventStream extends Serializable {

  /** File-stream over the events parquet, normalizing `ts` to a
    * micro-precision UTC TimestampType EXACTLY as the batch reader
    * ([[graft.util.Tables.events]]) does. The driver's testdata has
    * shipped `ts` under two physical types so far — parquet
    * TIMESTAMP(NANOS), readable only as long (nanosAsLong), and plain
    * tz-naive micros (pandas-written, read as TIMESTAMP_NTZ) — and a
    * regeneration can switch between them, so the streaming reader
    * probes the actual file schema with one driver-side batch footer
    * read instead of hard-coding either form. (Round 9 hard-coded the
    * nanos form here after fixing only the batch reader; micros÷1000
    * put every streamed timestamp in January 1970 and split the two
    * readers — StreamingSpec now pins `readEvents == Tables.events`.)
    *
    * On an EMPTY (or not-yet-populated) directory the probe read cannot
    * infer a schema; a stream must still be definable before data
    * arrives, so the reader falls back to `fallbackSchema` when given,
    * else to the current driver generation's shape (tz-naive micros +
    * props) — the form the first arriving files are expected to
    * carry. */
  def readEvents(spark: SparkSession, path: String,
      fallbackSchema: Option[StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") ||
              e.getMessage.contains("does not exist") =>
          fallbackSchema.getOrElse(StructType(Seq(
            StructField("event_id", LongType),
            StructField("ts", TimestampNTZType),
            StructField("user_id", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType),
            StructField("props", StringType))))
      }
    val stream = spark.readStream.schema(fileSchema).parquet(path)
    fileSchema("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  /** Watermarked tumbling-window aggregation (same shape as
    * EventOps.tumblingAgg). */
  def windowedAgg(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))

  /** Streaming idempotent-ingestion dedup: drop re-delivered events by
    * id, keeping state only within the watermark (late duplicates past
    * the watermark are the source's exactly-once contract, not ours —
    * unbounded `dropDuplicates` state would grow forever on a 100 TB
    * stream; `dropDuplicatesWithinWatermark` ages keys out with the
    * event-time watermark). Batch form: e3_event_dedup. */
  def dedupEvents(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the event stream against a static
    * dimension (user/customer attributes). The static side is
    * broadcast, so each micro-batch is a map-side hash join — no
    * stream state, no shuffle of the stream. Batch form:
    * e4_stream_enrich. */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Watermarked stream-stream interval join: purchases joined to the
    * same user's clicks within the trailing `windowHours` — the one
    * join shape where BOTH sides are unbounded streams. Spark derives
    * a state watermark from the two event-time watermarks plus the
    * interval condition, so buffered clicks are evicted once they can
    * no longer match any future purchase: state is click-rate ×
    * (window + watermark) per user, not the stream so far. Batch form
    * (identical predicate, shared via
    * [[graft.operators.EventOps.intervalJoinCond]]):
    * e5_interval_join. */
  def intervalJoin(events: DataFrame, windowHours: Int,
      watermark: String): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    p.join(c, graft.operators.EventOps.intervalJoinCond(windowHours))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Lossless epoch-microseconds: `getTime` is ms-truncated, so a
    * sub-millisecond ts (or a widthUs not divisible by 1000) would
    * bucket/gap differently than the batch operators' unix_micros(ts). */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionUpdate(user_id: Long, n_events: Int, start_us: Long,
      last_us: Long, closed: Boolean)

  /** The gap fold shared by [[sessionize]] and [[sessionizeTimeout]]:
    * a micro-batch's events in (ts, event_id) order either extend the
    * open session or close it and open a new one. Returns the closed
    * sessions (chronological) and the final open state — ONE rule,
    * two emission policies, so the gap semantics can never diverge. */
  private def foldGap(userId: Long, rows: Iterator[Event],
      st0: SessionState, gapUs: Long): (List[SessionUpdate], SessionState) = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var out = List.empty[SessionUpdate]
    var st = st0
    for (e <- sorted) {
      val us = micros(e.ts)
      if (st.n == 0) st = SessionState(us, us, 1)
      else if (us - st.last > gapUs) {
        out ::= SessionUpdate(userId, st.n, st.start, st.last, closed = true)
        st = SessionState(us, us, 1)
      } else st = SessionState(st.start, us, st.n + 1)
    }
    (out.reverse, st)
  }

  /** Stateful gap sessionization with `flatMapGroupsWithState`: emits an
    * update per user per micro-batch; a session closes when the gap rule
    * fires, mirroring EventOps.sessionize. */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionUpdate] = {
      val (closed, st) = foldGap(userId, rows,
        state.getOption.getOrElse(SessionState(-1, -1, 0)), gapUs)
      state.update(st)
      (closed :+
        SessionUpdate(userId, st.n, st.start, st.last, closed = false))
        .iterator
    }

    events.select(col("event_id"), col("ts"), col("user_id"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** [[sessionize]] with EVENT-TIME TIMEOUT eviction — the stateful
    * shape the gap rule alone cannot express: a session whose user
    * never returns closes anyway once the WATERMARK passes
    * `last + gap` (no on-time event can extend it past that point, so
    * the close is final and Append-safe). Without this, abandoned
    * sessions pin state forever — at 100 TB of users, state size
    * becomes the corpus's key cardinality instead of its ACTIVE-key
    * cardinality, which is the difference between a long-running job
    * and an OOM.
    *
    * Emissions are CLOSED sessions only (gap-closed or
    * timeout-closed); no per-batch open echo is needed because
    * timeout guarantees eventual closure of every session. State per
    * user is one (start, last, n) triple, removed at timeout — the
    * bounded-active-state contract.
    *
    * Contract vs batch: on a finite corpus whose watermark is pushed
    * past every `last + gap` (a sentinel event or stream end-of-life),
    * the closed set is row-identical to
    * [[graft.operators.EventOps.sessionize]] (StreamingSpec pins it).
    * Input rows older than the watermark are dropped by the stateful
    * operator's late-row filter, so a closed session can never be
    * resurrected or double-emitted. */
  def sessionizeTimeout(events: DataFrame, gapMinutes: Int,
      watermark: String = "10 minutes"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionUpdate] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single(
          SessionUpdate(userId, st.n, st.start, st.last, closed = true))
      } else {
        val (closed, st) = foldGap(userId, rows,
          state.getOption.getOrElse(SessionState(-1, -1, 0)), gapUs)
        state.update(st)
        // fire when the watermark passes the gap horizon (millis API)
        state.setTimeoutTimestamp((st.last + gapUs) / 1000L)
        closed.iterator
      }
    }

    events.select(col("event_id"), col("ts"), col("user_id"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class FillEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, value: Double)
  case class FillState(bucket: Long, n: Long, value: Double,
      maxId: Long)
  case class FillRow(user_id: Long, bucket: Long, n: Long,
      fill_value: Double, closed: Boolean)

  /** Stateful streaming gap fill — the incremental twin of
    * [[graft.operators.EventOps.resampleFill]]: per user, per
    * `widthUs` bucket, the event count and forward-filled last
    * observation, emitted as the stream advances instead of
    * recomputed over history.
    *
    * A bucket CLOSES (and its gap predecessors are emitted as n=0
    * carry rows) when the first event of a later bucket arrives —
    * the sessionize convention: closed rows are final under Append
    * mode, and each user's currently-open bucket rides along every
    * micro-batch with `closed=false`, so `closed ∪ open` replayed
    * over a batch corpus is row-identical to the batch operator
    * (StreamingSpec pins this). State per user is ONE (bucket, n,
    * value) triple — O(keys), not O(events), and gap emission cost
    * is the same output-driven span/width the batch grid pays.
    *
    * Late data (an event whose bucket precedes the open one — only
    * possible across micro-batches from out-of-order files) is
    * counted into the OPEN bucket's n and cannot move the carry
    * value: its true bucket is already emitted and Append-mode
    * output is immutable, so the count is preserved corpus-wide
    * (totals still reconcile) at the cost of bucket attribution —
    * the same trade a watermarked window makes when it refuses
    * late rows entirely. */
  def gapFill(events: DataFrame,
      widthUs: Long = 3600000000L): Dataset[FillRow] = {
    require(widthUs > 0, "widthUs must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[FillEvent],
        state: GroupState[FillState]): Iterator[FillRow] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var out = List.empty[FillRow]
      var st = state.getOption.orNull
      for (e <- sorted) {
        val b = Math.floorDiv(micros(e.ts), widthUs)
        if (st == null) st = FillState(b, 1, e.value, e.event_id)
        else if (b == st.bucket)
          // In-bucket carry = value of the MAX event_id — the batch
          // operator's max_by(value, event_id), not arrival order.
          st =
            if (e.event_id > st.maxId) FillState(b, st.n + 1, e.value, e.event_id)
            else st.copy(n = st.n + 1)
        else if (b < st.bucket) st = st.copy(n = st.n + 1)
        else {
          out ::= FillRow(userId, st.bucket, st.n, st.value, closed = true)
          var g = st.bucket + 1
          while (g < b) {
            out ::= FillRow(userId, g, 0, st.value, closed = true)
            g += 1
          }
          st = FillState(b, 1, e.value, e.event_id)
        }
      }
      state.update(st)
      (FillRow(userId, st.bucket, st.n, st.value, closed = false) :: out)
        .reverseIterator
    }

    events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[FillEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
