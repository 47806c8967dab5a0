package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic-regression training — the
  * model-in-the-loop half of corpus curation: heuristic rule engines
  * ([[Curation.qualityFilter]]) label a corpus, a linear classifier is
  * distilled from those labels, and the classifier's calibrated score
  * replaces the brittle rule cascade at serving time (the
  * fastText-style quality-classifier recipe of CCNet/GPT-3 data work
  * — Wenzek et al. 2020, Brown et al. 2020, public).
  *
  * Scale shape: each gradient-descent round is ONE corpus pass — the
  * current weight vector enters the plan as literals (broadcast by
  * value, the PageRank round convention), the per-row gradient
  * contribution `(σ(w·x) − y)·x` is a narrow codegen'd projection,
  * and the round's only shuffle is the partial-aggregated global sum
  * of d+1 doubles (map-side combine leaves one d+1-wide row per
  * task). Driver state is the weight vector itself — O(d), the
  * bounded-driver-state convention. `rounds` is fixed and small; at
  * 100 TB one trains on a [[Curation.stratifiedSample]] slice, scores
  * the full corpus with [[score]] (zero-shuffle), and never iterates
  * over the full corpus.
  *
  * Determinism: fixed zero init, fixed η/λ, and one literal operand
  * order — logit = ((b + w₁f₁) + w₂f₂) + …, update
  * wⱼ ← wⱼ − η·(gⱼ/n + λ·wⱼ) — that a SQL oracle replays verbatim as
  * unrolled round CTEs. The only engine divergence left is
  * partition-order float-sum jitter in the gradient sums (~1-ulp),
  * absorbed by the e6 decimal cut every score row exports.
  */
object LogReg {

  /** σ(z) with the literal arithmetic both engines share. */
  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(negate(z)))

  /** w·x as a left fold: ((w₀ + w₁f₁) + w₂f₂) + … — ONE operand
    * order, shared with the oracle. */
  private def logitOn(w: Array[Double], feats: Seq[Column]): Column =
    feats.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, i)) => acc + lit(w(i + 1)) * f
    }

  private def logit(w: Array[Double], featureCols: Seq[String]): Column =
    logitOn(w, featureCols.map(col))

  /** Train `rounds` full-batch GD steps of L2-regularized logistic
    * regression over `featureCols` (bias implicit). Returns the
    * weight vector [b, w₁, …]. */
  def train(df: DataFrame, labelCol: String, featureCols: Seq[String],
      eta: Double = 0.5, lambda: Double = 0.01,
      rounds: Int = 3): Array[Double] = {
    require(rounds >= 1 && featureCols.nonEmpty,
      "need rounds >= 1 and at least one feature")
    val x = df.select(
      (col(labelCol).cast("double").as("y") +:
        featureCols.map(f => col(f).cast("double").as(f))): _*)
    // cache: `rounds` passes re-read this frame; at corpus scale the
    // caller hands in a sampled slice so this is executor-memory-sized
    x.cache()
    try {
      val n = x.count().toDouble
      require(n > 0, "training frame is empty")
      var w = Array.fill(featureCols.size + 1)(0.0)
      for (_ <- 1 to rounds) {
        val p = sigmoid(logit(w, featureCols))
        val gradCols = sum(p - col("y")).as("g0") +:
          featureCols.zipWithIndex.map { case (f, i) =>
            sum((p - col("y")) * col(f)).as(s"g${i + 1}") }
        val g = x.agg(gradCols.head, gradCols.tail: _*).first()
        w = Array.tabulate(w.length)(j =>
          w(j) - eta * (g.getDouble(j) / n + lambda * w(j)))
      }
      w
    } finally x.unpersist()
  }

  /** The 100 TB training recipe, materialized: train on a seeded
    * deterministic slice of the corpus, score the full corpus with
    * the returned weights. [[train]] is `rounds` full passes over its
    * input — affordable on a sample, never on 100 TB — while [[score]]
    * stays one zero-shuffle projection regardless of corpus size. The
    * slice is the [[Curation.sampleDraw]] hash gate (rate in rows per
    * ten-thousand), so it is reproducible across runs and engines and
    * needs no shuffle or count to draw. The full-batch gradient is an
    * average, so its sampled estimate is unbiased with variance
    * ∝ 1/sample-size; LogRegSpec pins the sampled-vs-full weight
    * drift and score-disagreement bounds on a reference corpus. */
  def trainSampled(df: DataFrame, labelCol: String,
      featureCols: Seq[String], idCol: String, ratePerTenK: Int,
      seed: String = "lr-sample", eta: Double = 0.5,
      lambda: Double = 0.01, rounds: Int = 3): Array[Double] = {
    require(ratePerTenK > 0 && ratePerTenK <= 10000,
      "ratePerTenK must be in (0, 10000]")
    val slice =
      if (ratePerTenK == 10000) df
      else df.filter(
        Curation.sampleDraw(seed, col(idCol)) < lit(ratePerTenK))
    train(slice, labelCol, featureCols, eta, lambda, rounds)
  }

  /** σ(w·x) as a column — a narrow zero-shuffle projection over the
    * full corpus. */
  def score(w: Array[Double], featureCols: Seq[String]): Column =
    sigmoid(logit(w, featureCols))

  /** [[score]] over feature expressions instead of named columns —
    * for stateless stream projections that compute features in-row. */
  def scoreOn(w: Array[Double], feats: Seq[Column]): Column =
    sigmoid(logitOn(w, feats))

  /** The lr1 quality-feature recipe over raw text, row-local: token
    * count / 100, chars-per-token / 10, distinct-token ratio — the
    * same literal operand order the batch row and its oracle use, so
    * a stream gate scoring with these features is pinned ≡ the batch
    * scorer. `nChars` is passed in (a table column where one exists,
    * `length(text)` otherwise). Zero-token rows yield NaN features —
    * any threshold comparison is then false, i.e. dropped. */
  def qualityFeatures(text: Column, nChars: Column)
      : (Column, Column, Column) = {
    val toks = filter(split(trim(text), "\\s+"), w => w =!= "")
    val nw = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    (nw / lit(100.0), nChars.cast("double") / nw / lit(10.0), nd / nw)
  }
}
