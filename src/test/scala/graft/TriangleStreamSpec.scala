package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TriangleStream

/** TRIEST reservoir estimate (e14): the deterministic bottom-m
  * reservoir is order-independent, so any micro-batch split must land
  * on exactly the batch fold's state — the property that makes the
  * exact replay the oracle. */
class TriangleStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  // K8: 28 edges, C(8,3) = 56 triangles
  private def k8: Seq[(Long, Long)] =
    for {
      i <- 0L until 8L
      j <- (i + 1) until 8L
    } yield (i, j)

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("reservoir holds everything while t <= m: estimate is exact") {
    val row = TriangleStream.triangleEstimateReservoir(
      edgeDf(k8), "src", "dst", m = 100).collect()(0)
    assert(row.getLong(0) == 28L)  // seen_edges
    assert(row.getLong(1) == 28L)  // reservoir_edges
    assert(row.getLong(2) == 56L)  // sampled_triangles
    assert(row.getLong(3) == 56L)  // est_triangles == exact
  }

  test("local exact counter: hub orientation (wheel graph), star degeneracy") {
    // wheel: hub 100 (id far above the rim — the orientation-tie
    // trap) joined to a 10-cycle → exactly 10 triangles
    val rim = (0L until 10L).map(i => (i, (i + 1) % 10))
    val spokes = (0L until 10L).map(i => (100L, i))
    assert(TriangleStream.countTrianglesLocal(
      (rim ++ spokes).toArray) == 10L)
    // pure star: no triangles
    assert(TriangleStream.countTrianglesLocal(spokes.toArray) == 0L)
    // and the counter agrees with the distributed pass on K8
    assert(TriangleStream.countTrianglesLocal(k8.toArray) == 56L)
  }

  test("sampling path: reservoir is the bottom-m by priority, estimate scaled") {
    val row = TriangleStream.triangleEstimateReservoir(
      edgeDf(k8), "src", "dst", m = 10).collect()(0)
    assert(row.getLong(0) == 28L && row.getLong(1) == 10L)
    val sampled = row.getLong(2)
    val expected = math.floor(
      sampled.toDouble * TriangleStream.scaleUp(28L, 10)).toLong
    assert(row.getLong(3) == expected)
    // the reservoir graph has 10 of 28 edges — it cannot hold all 56
    assert(sampled < 56L)
  }

  test("streamed micro-batches reach exactly the batch fold's state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("triest").toString
    val parts = k8.grouped(10).toSeq  // 3 files: 10 + 10 + 8 edges
    parts.zipWithIndex.foreach { case (es, i) =>
      es.toDF("src", "dst").coalesce(1)
        .write.parquet(s"$dir/f$i")
      Thread.sleep(5) // distinct mod times → deterministic file order
    }
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = TriangleStream
      .triangleEstimateStream(stream, "src", "dst", m = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("triest")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("triest")
      .orderBy("seen_edges").collect()
    assert(rows.length == 3, "one emission per micro-batch")
    // seen grows monotonically to the full edge set
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 20L, 28L))
    // the FINAL state equals the batch fold bit for bit — the
    // order-independence contract the oracle replay rests on
    val batch = TriangleStream.triangleEstimateReservoir(
      edgeDf(k8), "src", "dst", m = 10).collect()(0)
    val last = rows.last
    assert((0 to 3).forall(i => last.getLong(i) == batch.getLong(i)),
      s"streamed $last != batch $batch")
  }

  test("re-delivery of reservoir-held edges does not inflate the seen count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("triest2").toString
    // batch 2 re-delivers ALL of batch 1 (at-least-once source);
    // m >= t keeps every edge in the reservoir, so each duplicate is
    // detected and the final state matches the exactly-once fold
    edgeDf(k8).coalesce(1).write.parquet(s"$dir/f0")
    Thread.sleep(5)
    edgeDf(k8).coalesce(1).write.parquet(s"$dir/f1")
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = TriangleStream
      .triangleEstimateStream(stream, "src", "dst", m = 100)
      .writeStream.outputMode("append")
      .format("memory").queryName("triest2")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("triest2").collect()
    assert(rows.forall(_.getLong(0) == 28L),
      s"duplicates inflated seen: ${rows.map(_.getLong(0)).toSeq}")
    assert(rows.forall(_.getLong(3) == 56L))
  }
}
