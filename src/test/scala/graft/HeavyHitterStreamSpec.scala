package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HeavyHitterStream

/** Streaming heavy-hitter gate (e15): count-min state is additive —
  * order/merge/partition-independent — so the epoch-ordered streamed
  * fold must emit exactly the batch fold's rows, and the sketch
  * estimate may only OVER-count (no true heavy hitter is ever
  * missed). */
class HeavyHitterStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  // epoch 1: a x6, b x2, c x2 (n=10); epoch 2: b x8, c x1, d x1
  // (prefix n=20)
  private def events: Seq[(Long, String)] =
    Seq.fill(6)((1L, "a")) ++ Seq.fill(2)((1L, "b")) ++
      Seq.fill(2)((1L, "c")) ++
      Seq.fill(8)((2L, "b")) ++ Seq((2L, "c"), (2L, "d"))

  private def evDf(es: Seq[(Long, String)]) = {
    import spark.implicits._
    es.toDF("batch", "key")
  }

  test("batch fold: exact counts at wide geometry, threshold decisions by hand") {
    // w=1024, 4 keys → collisions essentially impossible: est = exact.
    // theta = 300‰: epoch 1 needs est*1000 >= 300*10 → est >= 3 → a
    // only; epoch 2 prefix needs est >= 6 → a is absent from epoch 2
    // (only THAT epoch's keys emit), b has 10 >= 6 → b only.
    val got = HeavyHitterStream.heavyHittersBatch(evDf(events),
        "key", "batch", d = 4, w = 1024, thetaPermille = 300,
        seed = "spec")
      .orderBy("batch", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", 6L, 10L), (2L, "b", 10L, 20L)))
  }

  test("emissions are partition-independent (additive state)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      HeavyHitterStream.heavyHittersBatch(df, "key", "batch",
          d = 4, w = 64, thetaPermille = 100, seed = "spec")
        .orderBy("batch", "key").collect().map(_.toSeq).toSeq
    val a = run(evDf(events).repartition(32))
    val b = run(evDf(events).repartition(1))
    val c = run(evDf(scala.util.Random.shuffle(events)).repartition(7))
    assert(a == b && b == c)
  }

  test("CMS envelope: est >= exact always; no true heavy hitter missed") {
    import spark.implicits._
    // 40 keys over w=16 → collisions guaranteed; est may only ADD
    val es = (0 until 400).map(i => (1L + i % 4, s"k${i % 40}"))
    val got = HeavyHitterStream.heavyHittersBatch(evDf(es),
        "key", "batch", d = 3, w = 16, thetaPermille = 1,
        seed = "spec")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        r.getLong(2))).toMap
    // exact prefix counts per (epoch, key)
    val byEpoch = es.groupBy(_._1)
    val epochs = byEpoch.keys.toSeq.sorted
    var prefix = Map.empty[String, Long].withDefaultValue(0L)
    var n = 0L
    epochs.foreach { b =>
      val evs = byEpoch(b)
      evs.foreach { case (_, k) => prefix = prefix.updated(k, prefix(k) + 1) }
      n += evs.size
      evs.map(_._2).distinct.foreach { k =>
        val exact = prefix(k)
        got.get((b, k)).foreach { est =>
          assert(est >= exact, s"CMS under-counted ($b,$k): $est < $exact")
        }
        // theta=1‰: every key with exact*1000 >= n must be emitted
        // (est >= exact makes the threshold monotone)
        if (exact * 1000 >= n)
          assert(got.contains((b, k)), s"missed true heavy hitter ($b,$k)")
      }
    }
  }

  test("streamed epoch-ordered micro-batches emit exactly the batch fold's rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hhgate").toString
    // one file per epoch, written in epoch order → the stream folds
    // epochs non-decreasing, the documented contract
    events.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, es) =>
      es.toDF("batch", "key").coalesce(1).write.parquet(s"$dir/f$b")
      Thread.sleep(5)
    }
    val schema = StructType(Seq(StructField("batch", LongType),
      StructField("key", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = HeavyHitterStream.heavyHittersStream(stream, "key",
        "batch", d = 4, w = 1024, thetaPermille = 300, seed = "spec")
      .writeStream.outputMode("append")
      .format("memory").queryName("hhgate")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hhgate")
      .orderBy("batch", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = HeavyHitterStream.heavyHittersBatch(evDf(events),
        "key", "batch", d = 4, w = 1024, thetaPermille = 300,
        seed = "spec")
      .orderBy("batch", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("seeded resume: a gate warmed from the persisted state emits the tail of the full stream") {
    import spark.implicits._
    val epoch1 = events.filter(_._1 == 1L)
    val epoch2 = events.filter(_._1 == 2L)
    // offline state over epoch 1, persisted with geometry pinned
    val (n0, cells0) = HeavyHitterStream.hhGateState(
      evDf(epoch1), "key", d = 4, w = 1024, seed = "spec")
    HeavyHitterStream.writeHhGateState(spark, n0, cells0, 4, 1024,
      "spec", "spec_hh_state")
    // foreign geometry refused
    intercept[IllegalArgumentException] {
      HeavyHitterStream.loadHhGateState(spark, "spec_hh_state",
        4, 512, "spec")
    }
    val loaded = HeavyHitterStream.loadHhGateState(spark,
      "spec_hh_state", 4, 1024, "spec")
    assert(loaded == ((n0, cells0)))
    // stream ONLY epoch 2, seeded — its emissions must equal the
    // full-stream run's epoch-2 rows (counters are additive: seeded
    // state ≡ having streamed epoch 1)
    def streamOf(es: Seq[(Long, String)], name: String,
        init: Option[(Long, Seq[Long])]) = {
      val dir = java.nio.file.Files.createTempDirectory(name).toString
      es.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, evs) =>
        evs.toDF("batch", "key").coalesce(1).write.parquet(s"$dir/f$b")
        Thread.sleep(5)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
      val q = HeavyHitterStream.heavyHittersStream(stream, "key",
          "batch", 4, 1024, 300, "spec", init)
        .toDF().writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).orderBy("batch", "key").collect()
        .map(_.toSeq).toSeq
    }
    val seeded = streamOf(epoch2, "hhseeded", Some(loaded))
    val full = streamOf(events, "hhfull", None)
      .filter(_(0) == 2L)
    assert(seeded == full, s"seeded $seeded != full tail $full")
  }

  test("a micro-batch carrying several epochs folds them in epoch order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hhgate2").toString
    // ALL epochs in one file — one micro-batch, interleaved rows
    evDf(scala.util.Random.shuffle(events)).coalesce(1)
      .write.parquet(s"$dir/f0")
    val schema = StructType(Seq(StructField("batch", LongType),
      StructField("key", StringType)))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val q = HeavyHitterStream.heavyHittersStream(stream, "key",
        "batch", d = 4, w = 1024, thetaPermille = 300, seed = "spec")
      .writeStream.outputMode("append")
      .format("memory").queryName("hhgate2")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hhgate2")
      .orderBy("batch", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == Seq((1L, "a", 6L, 10L), (2L, "b", 10L, 20L)))
  }
}
