package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CardinalityStream

/** Streaming distinct-count gate (e16): HLL registers are a
  * per-bucket max — order/merge/duplication-invariant — so the
  * streamed fold must land on the batch fold's emissions exactly,
  * duplicates must be absorbed, and the pinned float recipe must
  * track the true cardinality inside the sketch's error envelope. */
class CardinalityStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private def evDf(es: Seq[(Long, String)]) = {
    import spark.implicits._
    es.toDF("batch", "key")
  }

  test("estimates track exact distincts inside the m=64 envelope; duplicates absorbed") {
    // epoch 1: 5 distinct keys (small range — the linear-counting
    // branch); epoch 2: 200 more (raw-estimate branch); every event
    // duplicated — a DISTINCT counter must not move
    val e1 = (0 until 5).map(i => (1L, s"k$i"))
    val e2 = (0 until 200).map(i => (2L, s"m$i"))
    val once = e1 ++ e2
    val twice = once ++ once
    def run(es: Seq[(Long, String)]) =
      CardinalityStream.distinctEstimateBatch(evDf(es), "key",
          "batch", "spec")
        .orderBy("batch").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
    val a = run(once)
    val b = run(twice)
    // duplication changes n_prefix but NEVER the register state
    assert(a.map(_._2).toSeq == b.map(_._2).toSeq)
    val est1 = a(0)._2 / 1e6
    val est2 = a(1)._2 / 1e6
    // 13% standard error at m=64; allow 3 sigma
    assert(math.abs(est1 - 5.0) <= 5.0 * 0.4, s"epoch1 est $est1")
    assert(math.abs(est2 - 205.0) <= 205.0 * 0.4, s"epoch2 est $est2")
    // prefix estimates are monotone here (registers only grow and
    // both epochs sit on the same branch boundary side)
    assert(est2 > est1)
  }

  test("batch emissions are partition- and order-independent") {
    val es = (0 until 300).map(i => (1L + i % 3, s"k${i % 97}"))
    def run(df: org.apache.spark.sql.DataFrame) =
      CardinalityStream.distinctEstimateBatch(df, "key", "batch",
          "spec")
        .orderBy("batch").collect().map(_.toSeq).toSeq
    val a = run(evDf(es).repartition(32))
    val b = run(evDf(es).repartition(1))
    val c = run(evDf(scala.util.Random.shuffle(es)).repartition(7))
    assert(a == b && b == c)
  }

  test("seeded resume: registers persisted, foreign seed refused, tail emissions identical") {
    import spark.implicits._
    val es = (0 until 240).map(i => (1L + i % 2, s"u${i % 53}"))
    val epoch1 = es.filter(_._1 == 1L)
    val epoch2 = es.filter(_._1 == 2L)
    val (n0, regs0) = CardinalityStream.hllGateState(
      evDf(epoch1), "key", "spec")
    CardinalityStream.writeHllGateState(spark, n0, regs0, "spec",
      "spec_hll_state")
    intercept[IllegalArgumentException] {
      CardinalityStream.loadHllGateState(spark, "spec_hll_state",
        "other-seed")
    }
    val loaded = CardinalityStream.loadHllGateState(spark,
      "spec_hll_state", "spec")
    assert(loaded == ((n0, regs0)))
    def streamOf(evs: Seq[(Long, String)], name: String,
        init: Option[(Long, Seq[Int])]) = {
      val dir = java.nio.file.Files.createTempDirectory(name).toString
      evs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, e) =>
        e.toDF("batch", "key").coalesce(1).write.parquet(s"$dir/f$b")
        Thread.sleep(5)
      }
      val schema = StructType(Seq(StructField("batch", LongType),
        StructField("key", StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
      val q = CardinalityStream.distinctEstimateStream(stream, "key",
          "batch", "spec", init)
        .toDF().writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).orderBy("batch").collect().map(_.toSeq).toSeq
    }
    val seeded = streamOf(epoch2, "hllseeded", Some(loaded))
    val full = streamOf(es, "hllfull", None).filter(_(0) == 2L)
    assert(seeded == full, s"seeded $seeded != full tail $full")
  }

  test("streamed epoch-aligned micro-batches emit exactly the batch fold's rows") {
    import spark.implicits._
    val es = (0 until 240).map(i => (1L + i % 4, s"u${i % 53}"))
    val dir = java.nio.file.Files.createTempDirectory("hllgate").toString
    es.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, evs) =>
      evs.toDF("batch", "key").coalesce(1).write.parquet(s"$dir/f$b")
      Thread.sleep(5)
    }
    val schema = StructType(Seq(StructField("batch", LongType),
      StructField("key", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = CardinalityStream.distinctEstimateStream(stream, "key",
        "batch", "spec")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("hllgate")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hllgate").orderBy("batch").collect()
      .map(_.toSeq).toSeq
    val batch = CardinalityStream.distinctEstimateBatch(evDf(es),
        "key", "batch", "spec")
      .orderBy("batch").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }
}
