package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate sketches for corpus-scale profiling — the
  * sub-shuffle-cost answers a 100 TB pipeline needs before committing
  * to exact work: join-key cardinalities (sizing broadcast vs shuffle,
  * bucket counts, salting decisions), vocabulary sizes, and
  * heavy-hitter token counts, each in ONE scan with bounded
  * (driver-collectable) state. Exact counterparts stay the source of
  * truth (a6/t5/u4 oracles); these are the planning instruments.
  * [[Bloom]] (membership) completes the sketch family.
  *
  * All three are Spark built-ins under the hood — HyperLogLog++ and
  * CountMinSketch aggregate via codegen'd partial aggregation, so the
  * scan combines map-side and the shuffle carries sketch state (KB),
  * never rows.
  */
object Sketches {

  /** Per-key approximate distinct values (HyperLogLog++): e.g.
    * distinct users per event type, distinct parts per order span.
    * `rsd` is the target relative standard deviation — state is
    * O(1/rsd²) per key, independent of cardinality. */
  def approxDistinctByKey(df: DataFrame, keyCol: String, valCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valCol), rsd).as("approx_distinct"))

  /** One-pass CountMinSketch over whitespace tokens of `textCol`.
    * The returned serialized sketch is bounded driver state
    * (width ≈ e/eps columns × ln(1/(1−confidence)) rows of longs) —
    * probe it with [[estimate]]. Over-estimates only: for any token,
    * estimate ≥ true count, and ≤ true + eps·N with the stated
    * confidence (N = total tokens). */
  def tokenCountSketch(df: DataFrame, textCol: String,
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): Array[Byte] =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .agg(count_min_sketch(col("tok"), lit(eps), lit(confidence),
        lit(seed)).as("cms"))
      .first().getAs[Array[Byte]](0)

  /** Deserialize a [[tokenCountSketch]] sketch for repeated probes. */
  def readSketch(sketch: Array[Byte])
      : org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))

  /** Driver-side probe of a [[tokenCountSketch]] sketch. The aggregate
    * added string items as their UTF-8 bytes, which is also what the
    * String probe path hashes — the two stay aligned. */
  def estimate(sketch: Array[Byte], token: String): Long =
    readSketch(sketch).estimateCount(token)

  /** k-minimum-values (bottom-k) distinct sketch per key — the
    * MERGEABLE summary the HLL lacks a set-operation story for
    * (Beyer et al. 2007, SIGMOD, public): keep the k smallest
    * deterministic hash values of each key's value set; any two
    * sketches then estimate UNION and INTERSECTION cardinalities
    * without re-touching the data ([[kmvDistinct]] /
    * [[kmvIntersect]]). Build cost is one distinct pass (8-byte hash
    * shuffle, map-side combined) plus a key-partitioned bottom-k cut;
    * the value is the reusable k·8-byte summary per segment —
    * compare S segments pairwise from S sketches, not S² scans.
    *
    * @return (keyCol, kmv: array<long> ascending, exact when the
    *         key's cardinality ≤ k). */
  def kmvByKey(df: DataFrame, keyCol: String, valCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumns
    val h = xxhash64(col(valCol)).bitwiseAND(lit(Long.MaxValue))
    // bottom-k via the bounded-heap partial aggregate (O(k) state
    // map-side, combines before the key shuffle) — a row_number
    // window here would fully SORT every distinct hash of a hot key
    // in one task just to keep k of them. Heap order is by the
    // negated-hash double (sub-ulp ties beyond 2^53 may swap
    // near-equal hashes — estimator-irrelevant, deterministic for a
    // given corpus); the output array re-sorts ascending exactly.
    val entry = GraftColumns.expression(struct(
      (-col("h")).cast("double").as("s"), col("h").as("v")))
    val topk = GraftColumns.column(
      graft.functions.BoundedTopK(entry, k).toAggregateExpression())
    df.select(col(keyCol), h.as("h")).distinct()
      .groupBy(col(keyCol))
      .agg(topk.as("top"))
      .select(col(keyCol),
        sort_array(transform(col("top"), x => x("v"))).as("kmv"))
  }

  private val HashSpace = math.pow(2.0, 63)

  /** Distinct-count estimate from one KMV sketch: exact below k,
    * (k−1)/θ_k above (θ = k-th smallest hash normalized to [0,1)). */
  def kmvDistinct(kmv: Array[Long], k: Int): Double =
    if (kmv.length < k) kmv.length.toDouble
    else (k - 1).toDouble * HashSpace / kmv(k - 1).toDouble

  /** One-pass Misra-Gries heavy-hitter summary over a string key
    * column ([[graft.functions.MisraGries]]): ≤ `k` (key, est)
    * counters, collected to the driver — bounded state, guarantee
    * verdicts in the Scaladoc there. The CMS complement: CMS
    * over-counts and needs the probe keys up front; MG under-counts
    * and SURFACES the heavy keys itself. */
  def heavyHitterSummary(df: DataFrame, keyCol: String,
      k: Int): Array[(String, Long)] = {
    import org.apache.spark.sql.GraftColumns
    df.select(GraftColumns.column(
        graft.functions.MisraGries(
          GraftColumns.expression(col(keyCol)), k)
          .toAggregateExpression()).as("mg"))
      .first().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toArray
  }

  /** Intersection estimate from two KMV sketches: the k smallest of
    * the merged hash sets are an unbiased sample of the UNION, the
    * fraction present in both sketches estimates the Jaccard, and
    * |A∩B| ≈ J · |A∪B|. Exact when the union fits below k. */
  def kmvIntersect(a: Array[Long], b: Array[Long], k: Int): Double = {
    val sa = a.toSet; val sb = b.toSet
    val merged = (sa ++ sb).toArray.sorted
    if (merged.length < k) (sa & sb).size.toDouble
    else {
      val sample = merged.take(k)
      val inBoth = sample.count(h => sa(h) && sb(h))
      val du = (k - 1).toDouble * HashSpace / sample(k - 1).toDouble
      inBoth.toDouble / k * du
    }
  }
}
