package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A shuffle join partitions both sides by the join key, so one hot
  * key (one newspaper title with 100× the issues, one boilerplate
  * document duplicated across the corpus) lands its entire row set in
  * ONE task — the straggler that turns a 10-minute stage into hours at
  * 100 TB. Salting splits the hot key's rows across `nSalts`
  * partitions: the big side gets a deterministic per-row salt, the
  * small side is replicated once per salt value, and the join key
  * becomes (key, salt). Row multiplicity is unchanged — each big-side
  * row still meets each matching small-side row exactly once — so the
  * result is identical to the unsalted join.
  *
  * When to use WHICH tool:
  *  - aggregation skew: nothing — partial (map-side) aggregation
  *    already shrinks hot groups before the shuffle;
  *  - join skew, small dimension: `broadcast()` — no shuffle at all;
  *  - join skew, both sides large: AQE's skew-join split
  *    (`spark.sql.adaptive.skewJoin`) handles post-shuffle splits of
  *    MAP-side partitions automatically; explicit salting remains the
  *    tool when the skew is known ahead of time, when AQE's
  *    per-partition thresholds don't trigger (many medium-hot keys),
  *    or when the engine must not depend on runtime re-planning.
  *
  * The salt is `hash mod nSalts` of deterministic row columns — NOT
  * `rand()` — so retried tasks re-produce identical output
  * ([[Curation.seededHash]] rationale).
  *
  * Measured (BENCH_NOTES.md round 6, 20M rows/40% hot ⋈ 200k): on
  * local[32] plain sort-merge, AQE skew-split and salting converge
  * within host noise — the local harness can't reproduce the
  * 1000-task straggler this guards against. The reproducible win is
  * [[chooseSalts]] refusing to salt uniform keys: j12 2.47 s (fixed
  * 8 salts) → 0.84 s (degenerates to the plain join).
  */
object Skew {

  /** Inner equi-join with a salted key: `big ⋈ small` on
    * `bigKey = smallKey`, with big-side rows spread over `nSalts`
    * sub-partitions per key and the small side replicated `nSalts`×.
    * `saltSource` must be deterministic per big-side row (an id
    * column; NOT rand()).
    *
    * Cost model: small side shuffles/stores nSalts× its size; big
    * side's hottest key now occupies nSalts tasks. Pick nSalts ≈
    * (hot-key rows) / (target rows per task). */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltSource: Column,
      nSalts: Int): DataFrame = {
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val salted = big.withColumn("__salt",
      pmod(hash(saltSource), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted
      // frame-qualified references: the unqualified col(...) form is
      // ambiguous whenever both sides name their key identically (the
      // common fact ⋈ dim shape)
      .join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Size `nSalts` from a sampled key histogram instead of guessing:
    * estimate the hottest key's row count from a `sampleFraction`
    * sample and split it into tasks of ≈`targetRowsPerTask`. Costs one
    * extra sampled scan + a single-row collect (bounded); at 100 TB
    * that scan is the cheap insurance against an nSalts that is 10×
    * too small (straggler survives) or 10× too big (small side
    * replicated 10× for nothing — the saltedJoin cost model).
    *
    * Returns 1 when no key is hot — callers then skip salting
    * entirely and keep the plain shuffle join.
    *
    * Determinism caveat: `sample(seed)` is only deterministic FOR A
    * FIXED PARTITIONING — different parquet splits (different
    * maxPartitionBytes, different cluster) sample different rows, so
    * nSalts (and whether a j12-style plan salts at all) can differ
    * across environments even though join RESULTS never do. Treat
    * plan-shape audits and cross-host bench comparisons accordingly.
    * Estimator bias: `max(count)/fraction` is the max of many
    * binomial draws, which reads high on near-uniform keys; singleton
    * sample hits (count 1, common under small fractions) are floored
    * out of the extrapolation below rather than projected 1/fraction-
    * fold into phantom hot keys. */
  def chooseSalts(big: DataFrame, bigKey: String,
      targetRowsPerTask: Long = 1000000L,
      sampleFraction: Double = 0.01,
      maxSalts: Int = 64): Int = {
    val sampled = big.sample(withReplacement = false, sampleFraction,
        seed = 42)
      .groupBy(col(bigKey)).count()
      .agg(max(col("count"))).collect()(0)
    // a sampled max of 1 is no evidence of heat (any singleton hit
    // extrapolates to 1/fraction rows) — require at least 2 sampled
    // occurrences before projecting a hot-key estimate
    if (sampled.isNullAt(0) || sampled.getLong(0) < 2) 1
    else {
      val hotEstimate = (sampled.getLong(0) / sampleFraction).toLong
      val salts = math.ceil(hotEstimate.toDouble / targetRowsPerTask).toInt
      math.min(math.max(salts, 1), maxSalts)
    }
  }

  /** [[saltedJoin]] with `nSalts` sized by [[chooseSalts]]; degenerates
    * to the plain shuffle join when the histogram shows no hot key, so
    * the uniform case pays only the sampled scan. */
  def autoSaltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltSource: Column,
      targetRowsPerTask: Long = 1000000L,
      sampleFraction: Double = 0.01,
      maxSalts: Int = 64): DataFrame = {
    val n = chooseSalts(big, bigKey, targetRowsPerTask, sampleFraction,
      maxSalts)
    if (n <= 1) big.join(small, big(bigKey) === small(smallKey))
    else saltedJoin(big, small, bigKey, smallKey, saltSource, n)
  }
}
