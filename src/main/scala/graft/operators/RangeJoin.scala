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
      width: Double): DataFrame =
    bucketizedByKey(points, pointCol, intervals, loCol, hiCol, width, Nil)

  /** [[bucketized]] with additional equi-key pairs — the
    * temporal-validity / SCD-2 join shape (`point.key = interval.key
    * AND point.v BETWEEN lo AND hi`, e.g. an event joined to the
    * dimension version valid at its timestamp). The equi-keys join
    * the bucket id in the shuffle key, so co-keyed rows land together
    * and the range check stays partition-local; with keys the
    * replicated interval side shrinks to per-key spans, typically ~2
    * buckets each.
    *
    * @param keys (pointKeyCol, intervalKeyCol) pairs */
  def bucketizedByKey(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Double, keys: Seq[(String, String)]): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(width)).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val cond = keys.foldLeft(p("__bucket") === i("__bucket")) {
      case (c, (pk, ik)) => c && p(pk) === i(ik)
    }
    p.join(i, cond)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(p("__bucket")).drop(i("__bucket"))
  }
}
