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

  test("KMV sketch: exact below k, bounded estimates above, valid membership") {
    import spark.implicits._
    import graft.operators.Sketches
    val k = 128
    // segment A = ids 0..999, B = 500..1499 -> |A∩B| = 500, |A∪B| = 1500
    val df = ((0L until 1000L).map(("A", _)) ++
      (500L until 1500L).map(("B", _))).toDF("seg", "id")
    val sk = Sketches.kmvByKey(df, "seg", "id", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toMap
    assert(sk("A").length == k && (sk("A") sameElements sk("A").sorted))
    val dA = Sketches.kmvDistinct(sk("A"), k)
    assert(math.abs(dA - 1000) <= 6.0 / math.sqrt(k.toDouble) * 1000,
      s"distinct estimate off: $dA")
    val inter = Sketches.kmvIntersect(sk("A"), sk("B"), k)
    assert(math.abs(inter - 500) <= 6.0 / math.sqrt(k.toDouble) * 1500,
      s"intersect estimate off: $inter")
    // small segments are EXACT: sketches below k are the full hash set
    val tiny = Seq(("X", 1L), ("X", 2L), ("Y", 2L), ("Y", 3L))
      .toDF("seg", "id")
    val tk = Sketches.kmvByKey(tiny, "seg", "id", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toMap
    assert(Sketches.kmvDistinct(tk("X"), k) == 2.0)
    assert(Sketches.kmvIntersect(tk("X"), tk("Y"), k) == 1.0)
    // the sk3 oracle row's verdicts all hold
    val sk3 = SparkEntry.queries("sk3_kmv_overlap")(spark, sf).collect()
    assert(sk3.nonEmpty)
    assert(sk3.forall(_.getAs[Boolean]("within_envelope")))
  }

  test("Misra-Gries: exact when the key space fits in k counters") {
    import spark.implicits._
    val rows = Seq("a", "a", "b", "a", "c", "b").toDF("tok")
      .repartition(3)
    val mg = Sketches.heavyHitterSummary(rows, "tok", k = 8).toMap
    assert(mg == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("Misra-Gries: hand-traced decrement path in one partition") {
    import spark.implicits._
    // k=2, stream a a a b c d: c hits a full table (a:3 b:1 → a:2,
    // b drops), d inserts → {a:2, d:1}
    val rows = Seq("a", "a", "a", "b", "c", "d").toDF("tok").coalesce(1)
    val mg = Sketches.heavyHitterSummary(rows, "tok", k = 2).toMap
    assert(mg == Map("a" -> 2L, "d" -> 1L))
  }

  test("Misra-Gries: guarantees hold on planted Zipf across partitionings") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    // 200 distinct keys, heavy head: key i appears ~ 4000/i times
    val items = (1 to 200).flatMap(i =>
      Seq.fill(math.max(1, 4000 / i))(s"k$i"))
    val shuffled = rnd.ints(items.size, 0, items.size).toArray
      .zip(items).sortBy(_._1).map(_._2)
    val n = items.size.toLong
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    for (parts <- Seq(1, 7, 32); k <- Seq(16, 64)) {
      val mg = Sketches.heavyHitterSummary(
        shuffled.toSeq.toDF("tok").repartition(parts), "tok", k).toMap
      val bound = n / (k + 1)
      exact.foreach { case (t, c) =>
        val est = mg.getOrElse(t, 0L)
        assert(est <= c, s"parts=$parts k=$k $t over-counts")
        assert(c - est <= bound,
          s"parts=$parts k=$k $t undercount ${c - est} > $bound")
        if (c > bound)
          assert(mg.contains(t), s"parts=$parts k=$k heavy $t missing")
      }
      assert(mg.size <= k)
    }
  }

  test("Misra-Gries: the sk4 oracle row's verdicts all hold") {
    val sk4 = SparkEntry.queries("sk4_mg_envelope")(spark, sf).collect()
    assert(sk4.nonEmpty)
    assert(sk4.forall(r => r.getAs[Boolean]("le_exact") &&
      r.getAs[Boolean]("within_bound") && r.getAs[Boolean]("survives_ok")))
  }
}
