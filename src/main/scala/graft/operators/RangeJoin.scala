package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join — `point BETWEEN lo AND hi` as an equi-join.
  *
  * Spark has no range-join optimization: a plain
  * `points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")` plans a
  * (broadcast) nested-loop join — O(|points|·|intervals|) comparisons,
  * the quadratic cliff every interval-overlap workload hits at scale.
  * The standard fix (Databricks' range-join hint, interval trees in
  * single-node engines) maps both sides onto fixed-width buckets:
  * each POINT lands in exactly one bucket (`floor(v / width)`), each
  * INTERVAL replicates to the buckets its span covers
  * (`floor(lo/w) … floor(hi/w)` — `sequence` + `explode`), the join
  * becomes an equi-join on the bucket id, and the ORIGINAL predicate
  * re-applies as an exact post-filter (bucket collisions are
  * candidates, never results — correctness is independent of `width`).
  *
  * Scale shape: one shuffle per side keyed by bucket (or a broadcast
  * of the replicated interval side when it is small), partition-local
  * hash probes instead of per-pair comparisons. Cost is
  * |points| + Σ(span/width) replicated interval rows; pick `width`
  * near the TYPICAL interval span so intervals replicate ~2× (the
  * interval-tree fanout trade). Degenerate giant intervals replicate
  * proportionally — cap them upstream or route the few whales through
  * a broadcast side union, the same whale/crowd split as
  * [[Skew.autoSaltedJoin]].
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them.
    *
    * @param points    frame with `pointCol` (numeric)
    * @param intervals frame with `loCol`/`hiCol` (numeric, lo <= hi)
    * @param width     bucket width (> 0), in the columns' units
    * @return the joined frame (all columns of both inputs), exactly
    *         the rows of the naive theta-join. */
  def bucketized(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(width)).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
