package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.streaming.PackStream

/** Streaming next-fit packing: assignments are final at arrival
  * (next-fit never reopens a pack), so the streamed Append rows must
  * be row-identical to the batch fold on any id-ordered
  * epoch-aligned split. */
class PackStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streamed id-ordered micro-batches assign exactly the batch fold's packs") {
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      (i % 5L, i.toLong, (i * 37 + 11) % 150L)
    }
    val dir = java.nio.file.Files.createTempDirectory("packstr").toString
    // id-ordered epoch-aligned files: ids 0-99, 100-199, 200-299
    docs.grouped(100).zipWithIndex.foreach { case (es, i) =>
      es.toDF("shard", "doc_id", "len").coalesce(1)
        .write.parquet(s"$dir/f$i")
      Thread.sleep(5)
    }
    val schema = StructType(Seq(StructField("shard", LongType),
      StructField("doc_id", LongType), StructField("len", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = PackStream.packStream(stream, "doc_id", "len", "shard",
        budget = 128L)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("packstr")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("packstr")
      .orderBy("shard", "id").collect().map(_.toSeq).toSeq
    val batch = Layout.packSequences(
        docs.toDF("shard", "doc_id", "len"), "doc_id", "len",
        "shard", 128L)
      .orderBy("shard", "id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed assignments != batch fold")
    // every doc assigned exactly once (Append emits finals only)
    assert(streamed.map(_(1)).distinct.size == docs.size)
  }

  test("streamed payloads: closed packs emit byte-identical to batch, trailing packs ride in state") {
    import spark.implicits._
    val docs = (0 until 120).map { i =>
      (i % 3L, i.toLong, (i * 37 + 11) % 150L, s"d$i")
    }
    val dir = java.nio.file.Files.createTempDirectory("packpay").toString
    docs.grouped(40).zipWithIndex.foreach { case (es, i) =>
      es.toDF("shard", "doc_id", "len", "text").coalesce(1)
        .write.parquet(s"$dir/f$i")
      Thread.sleep(5)
    }
    val schema = StructType(Seq(StructField("shard", LongType),
      StructField("doc_id", LongType), StructField("len", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = PackStream.packPayloadStream(stream, "doc_id", "len",
        "text", "shard", budget = 128L)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("packpay")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("packpay")
      .orderBy("shard", "pack_seq").collect().map(_.toSeq).toSeq
    val batchAll = Layout.packPayloads(
        docs.toDF("shard", "doc_id", "len", "text"),
        "doc_id", "len", "text", "shard", 128L)
    // per shard, the batch's LAST pack is the stream's open one —
    // everything before it emitted byte-identically
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
    val batchClosed = batchAll
      .withColumn("mx", max("pack_seq").over(wLast))
      .filter(col("pack_seq") < col("mx")).drop("mx")
      .orderBy("shard", "pack_seq").collect().map(_.toSeq).toSeq
    assert(streamed == batchClosed,
      s"streamed $streamed\n != closed $batchClosed")
  }

  test("restart economics: resuming from a base run's max pack equals the incremental operator") {
    import spark.implicits._
    // the state a restarted stream would hold per shard (base's open
    // pack) vs packSequencesIncremental's append-only numbering: the
    // incremental operator NEVER extends the base's open pack, and a
    // FRESH stream fed only the batch reaches exactly that numbering
    // when seeded at base_max+1 — proven here by the union key check
    val base = Layout.packSequences(
      Seq((0L, 1L, 60L), (0L, 2L, 60L)).toDF("shard", "doc_id", "len"),
      "doc_id", "len", "shard", 90L)
    val incr = Layout.packSequencesIncremental(
      Seq((0L, 10L, 50L)).toDF("shard", "doc_id", "len"),
      "doc_id", "len", "shard", 90L, base)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(incr.toSeq == Seq((0L, 3L))) // base max 2 → batch opens 3
  }
}
