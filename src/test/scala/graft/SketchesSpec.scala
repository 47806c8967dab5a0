package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.util.Tables

/** Sketch accuracy contracts against exact ground truth on the driver
  * testdata — the planning instruments must be honest about their
  * error envelopes. */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("HLL per-key distinct counts sit inside the rsd envelope") {
    val events = Tables.events(spark, sf)
    val approx = Sketches.approxDistinctByKey(events, "event_type", "user_id",
      rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      // 5 standard deviations of headroom at rsd=0.02
      assert(math.abs(a - n) <= math.max(1L, (n * 0.10).toLong),
        s"$k: approx $a vs exact $n")
    }
  }

  test("CMS token estimates never undercount and bound the overcount") {
    val docs = Tables.documents(spark, sf).limit(200)
    val sketch = Sketches.tokenCountSketch(docs, "text",
      eps = 0.001, confidence = 0.99)
    val exact = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").count()
    val totalTokens = exact.agg(sum("count")).first().getLong(0)
    val top = exact.orderBy(desc("count")).limit(20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    top.foreach { case (tok, n) =>
      val est = Sketches.estimate(sketch, tok)
      assert(est >= n, s"CMS undercounted '$tok': $est < $n")
      assert(est <= n + (0.001 * totalTokens).toLong + 1,
        s"CMS overcounted '$tok' beyond eps*N: $est vs $n (N=$totalTokens)")
    }
    // a token that never occurs estimates (close to) zero
    assert(Sketches.estimate(sketch, "zz-never-a-token-zz") <=
      (0.001 * totalTokens).toLong + 1)
  }

  test("sk1/sk2 oracle rows: every envelope verdict is true") {
    // the driver-checked rows compare these verdict columns against a
    // literal TRUE oracle — any false here is tomorrow's red row
    val sk1 = SparkEntry.queries("sk1_hll_envelope")(spark, sf).collect()
    assert(sk1.nonEmpty)
    assert(sk1.forall(_.getAs[Boolean]("within_3rsd")))
    val sk2 = SparkEntry.queries("sk2_cms_envelope")(spark, sf).collect()
    assert(sk2.length == 20)
    assert(sk2.forall(r =>
      r.getAs[Boolean]("ge_exact") && r.getAs[Boolean]("within_eps")))
  }
}
