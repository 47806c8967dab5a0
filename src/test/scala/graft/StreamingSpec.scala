package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.util.Tables

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  // the file-stream source requires a directory; stage the single parquet
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming windowed agg equals the batch tumbling agg") {
    val stream = EventStream.readEvents(spark, eventsPath)
    val agg = EventStream.windowedAgg(stream, "1 hour", "10 minutes")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("w_start"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winagg")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("winagg")
      .orderBy("w_start", "event_type").collect()
    val batch = EventOps.tumblingAgg(Tables.events(spark, sf), "1 hour")
      .orderBy("w_start", "event_type").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(s.getDouble(3) == b.getDouble(3))
    }
  }

  test("stateful streaming sessionization agrees with batch sessionize") {
    val stream = EventStream.readEvents(spark, eventsPath)
    val updates = EventStream.sessionize(stream, 30)
    val q = updates.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions")
    val batch = EventOps.sessionize(Tables.events(spark, sf), 30)
    // closed sessions + one open session per user == batch session count
    assert(streamed.count() == batch.count())
    // per-user total event counts agree
    val sTotals = streamed.groupBy("user_id")
      .agg(sum("n_events").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bTotals = batch.groupBy("user_id")
      .agg(sum("n_events").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sTotals == bTotals)
  }
}
