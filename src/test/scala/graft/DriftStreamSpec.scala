package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream

/** Streaming drift gate (e17): the first epoch is the pinned
  * reference (its own PSI is exactly 0), a flipped distribution must
  * trip the threshold, and the streamed fold must emit exactly the
  * batch fold's rows on epoch-aligned splits. */
class DriftStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  // epoch 1: mass on bucket 0; epoch 2: same shape (no drift);
  // epoch 3: mass flipped to bucket 3 (drift)
  private def events: Seq[(Long, Int)] =
    Seq.fill(90)((1L, 0)) ++ Seq.fill(10)((1L, 1)) ++
      Seq.fill(88)((2L, 0)) ++ Seq.fill(12)((2L, 1)) ++
      Seq.fill(10)((3L, 0)) ++ Seq.fill(90)((3L, 3))

  private def evDf(es: Seq[(Long, Int)]) = {
    import spark.implicits._
    es.toDF("batch", "bucket")
  }

  test("reference epoch scores exactly zero; flipped mass trips the threshold") {
    val got = DriftStream.psiGateBatch(evDf(events), "bucket",
        "batch", nBuckets = 4, psiThreshold = 0.25)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length == 3)
    assert(got(0) == ((1L, 100L, 0L, false)), s"ref epoch: ${got(0)}")
    assert(!got(1)._4 && got(1)._3 < 250000000L,
      s"same-shape epoch drifted: ${got(1)}")
    assert(got(2)._4 && got(2)._3 > 250000000L,
      s"flipped epoch not flagged: ${got(2)}")
  }

  test("out-of-range buckets drop from counts AND totals (the x16 precondition)") {
    val withJunk = events ++ Seq.fill(50)((2L, 99)) ++
      Seq.fill(5)((3L, -1))
    val a = DriftStream.psiGateBatch(evDf(events), "bucket", "batch",
      4, 0.25).orderBy("batch").collect().map(_.toSeq).toSeq
    val b = DriftStream.psiGateBatch(evDf(withJunk), "bucket",
      "batch", 4, 0.25).orderBy("batch").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("seeded resume: a persisted reference pins the baseline; foreign width refused") {
    import spark.implicits._
    import graft.streaming.DriftStream.RefState
    // persist epoch 1's histogram as the reference
    val h = Array(90L, 10L, 0L, 0L) // epoch 1's counts at nBuckets=4
    DriftStream.writePsiGateRef(spark, 1L, 100L, h.toVector,
      "spec_psi_ref")
    intercept[IllegalArgumentException] {
      DriftStream.loadPsiGateRef(spark, "spec_psi_ref", 10)
    }
    val loaded = DriftStream.loadPsiGateRef(spark, "spec_psi_ref", 4)
    assert(loaded == RefState(1L, 100L, h.toVector))
    // a seeded gate fed ONLY epoch 3 scores it against the loaded
    // reference — not against epoch 3 itself (which would read 0)
    val dir = java.nio.file.Files.createTempDirectory("psiseed")
      .toString
    evDf(events.filter(_._1 == 3L)).coalesce(1)
      .write.parquet(s"$dir/f3")
    val schema = StructType(Seq(StructField("batch", LongType),
      StructField("bucket", IntegerType)))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val q = DriftStream.psiGateStream(stream, "bucket", "batch", 4,
        0.25, Some(loaded))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("psiseed")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("psiseed").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.length == 1 && got(0)._1 == 3L)
    assert(got(0)._3 && got(0)._2 > 0L,
      s"flipped epoch must drift against the SEEDED reference: ${got(0)}")
  }

  test("streamed epoch-aligned micro-batches emit exactly the batch fold's rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("driftgate")
      .toString
    events.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, es) =>
      es.toDF("batch", "bucket").coalesce(1)
        .write.parquet(s"$dir/f$b")
      Thread.sleep(5)
    }
    val schema = StructType(Seq(StructField("batch", LongType),
      StructField("bucket", IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = DriftStream.psiGateStream(stream, "bucket", "batch",
        nBuckets = 4, psiThreshold = 0.25)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("driftgate")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("driftgate").orderBy("batch")
      .collect().map(_.toSeq).toSeq
    val batch = DriftStream.psiGateBatch(evDf(events), "bucket",
        "batch", 4, 0.25)
      .orderBy("batch").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }
}
