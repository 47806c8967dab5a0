package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogReg

class LogRegSpec extends AnyFunSuite {
  import SparkTestSession._

  test("train: one round matches the hand-derived gradient step") {
    import spark.implicits._
    // w=0 → σ(0)=0.5 for every row, so g0 = Σ(0.5−y), g1 = Σ(0.5−y)·f
    val df = Seq((1.0, 2.0), (0.0, -1.0), (1.0, 0.5), (0.0, 0.0))
      .toDF("y", "f1")
    val w = LogReg.train(df, "y", Seq("f1"), eta = 0.5, lambda = 0.01,
      rounds = 1)
    val n = 4.0
    val g0 = (0.5 - 1.0) + (0.5 - 0.0) + (0.5 - 1.0) + (0.5 - 0.0)
    val g1 = (0.5 - 1.0) * 2.0 + (0.5 - 0.0) * -1.0 +
      (0.5 - 1.0) * 0.5 + (0.5 - 0.0) * 0.0
    assert(w(0) == 0.0 - 0.5 * (g0 / n + 0.01 * 0.0))
    assert(w(1) == 0.0 - 0.5 * (g1 / n + 0.01 * 0.0))
  }

  test("train: separable data — scores order by the separating feature") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val rows = (1 to 400).map { _ =>
      val y = if (rnd.nextBoolean()) 1.0 else 0.0
      // feature shifted by the label, plus noise
      (y, y * 2.0 - 1.0 + rnd.nextGaussian() * 0.3)
    }
    val df = rows.toDF("y", "f1").repartition(8)
    val w = LogReg.train(df, "y", Seq("f1"), rounds = 20)
    assert(w(1) > 0.5, s"positive-class feature weight, got ${w(1)}")
    val scored = df.select(col("y"),
      LogReg.score(w, Seq("f1")).as("p")).collect()
    val posMean = scored.filter(_.getDouble(0) == 1.0)
      .map(_.getDouble(1)).sum / scored.count(_.getDouble(0) == 1.0)
    val negMean = scored.filter(_.getDouble(0) == 0.0)
      .map(_.getDouble(1)).sum / scored.count(_.getDouble(0) == 0.0)
    assert(posMean > negMean + 0.2,
      s"separation: pos=$posMean neg=$negMean")
  }

  test("train: deterministic across re-runs and partitionings") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      (if (i % 3 == 0) 1.0 else 0.0, i / 100.0, (i % 7).toDouble))
    val a = LogReg.train(rows.toDF("y", "f1", "f2").repartition(2),
      "y", Seq("f1", "f2"))
    val b = LogReg.train(rows.toDF("y", "f1", "f2").repartition(13),
      "y", Seq("f1", "f2"))
    // same sums up to partition-order float jitter; the e6 cut the
    // oracle rows use absorbs far more than this
    (a zip b).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12, s"$x vs $y") }
  }

  test("trainSampled: sampled weights stay close to full training and agree on scores") {
    import spark.implicits._
    // reference corpus: separable-with-noise, ids for the seeded draw
    val rnd = new java.util.Random(23)
    val rows = (1L to 4000L).map { i =>
      val y = if (rnd.nextBoolean()) 1.0 else 0.0
      (i, y, y * 2.0 - 1.0 + rnd.nextGaussian() * 0.4,
        rnd.nextGaussian() * 0.5)
    }
    val df = rows.toDF("doc_id", "y", "f1", "f2").repartition(8)
    val fs = Seq("f1", "f2")
    val full = LogReg.train(df, "y", fs, rounds = 10)
    // 25% slice — the 100 TB recipe's shape (sample rate chosen so the
    // slice still holds thousands of rows; variance ∝ 1/sample size)
    val sampled = LogReg.trainSampled(df, "y", fs, "doc_id", 2500,
      rounds = 10)
    // deterministic: the seeded slice replays identically
    val again = LogReg.trainSampled(df, "y", fs, "doc_id", 2500,
      rounds = 10)
    assert(sampled.sameElements(again))
    // weight drift bound: relative L2 distance of the weight vectors
    val l2 = math.sqrt((full zip sampled)
      .map { case (a, b) => (a - b) * (a - b) }.sum)
    val norm = math.sqrt(full.map(x => x * x).sum)
    assert(l2 / norm < 0.15, s"weight drift ${l2 / norm}: " +
      s"full=${full.toSeq} sampled=${sampled.toSeq}")
    // decision drift bound: <2% of the corpus flips side at the 0.5 cut
    val disagree = df.select(
        (LogReg.score(full, fs) >= 0.5) =!=
          (LogReg.score(sampled, fs) >= 0.5)).as[Boolean]
      .filter((b: Boolean) => b).count()
    assert(disagree < 80, s"$disagree of 4000 flipped at the 0.5 cut")
    // rate 10000 = the full corpus, bit-identical to train
    assert(LogReg.trainSampled(df, "y", fs, "doc_id", 10000,
      rounds = 3).sameElements(LogReg.train(df, "y", fs, rounds = 3)))
    intercept[IllegalArgumentException] {
      LogReg.trainSampled(df, "y", fs, "doc_id", 0)
    }
  }

  test("train: empty frame and bad args are rejected") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("y", "f1")
    intercept[IllegalArgumentException] {
      LogReg.train(empty, "y", Seq("f1"))
    }
    intercept[IllegalArgumentException] {
      LogReg.train(Seq((1.0, 1.0)).toDF("y", "f1"), "y", Seq("f1"),
        rounds = 0)
    }
  }

  test("train: gradient pass is a single partial-aggregated pass (no per-round shuffle explosion)") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (0.0, -1.0)).toDF("y", "f1")
    val p = sigmoidCol(Array(0.1, 0.2))
    val plan = df.agg(sum(p - col("y")).as("g0"),
        sum((p - col("y")) * col("f1")).as("g1"))
      .queryExecution.executedPlan.toString
    // partial + final HashAggregate pair, one exchange, no join
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Join"), plan)
  }

  private def sigmoidCol(w: Array[Double]) = {
    val z = lit(w(0)) + lit(w(1)) * col("f1")
    lit(1.0) / (lit(1.0) + exp(negate(z)))
  }
}
