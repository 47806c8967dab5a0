package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Iter

/** Graph analytics over edge-list DataFrames — the iterative-fixpoint
  * family ([[Dedup.dupClusters]] is its connected-components sibling).
  * PageRank here is the classic damped power iteration (Page et al.
  * 1999; the Spark GraphX/Pregel formulation re-expressed as plain
  * DataFrame joins so Catalyst plans every round).
  *
  * Scale shape (100 TB of edges): each round is ONE join of the edge
  * list against the current rank vector (both sides hash-partitioned
  * on the join key — AQE reuses the exchange-level partitioning of the
  * static edge side across rounds once it is materialized) plus one
  * dst-keyed partial-aggregated shuffle whose output is one row per
  * NODE, not per edge. Ranks are materialized per round
  * ([[graft.util.Iter.materialize]]) to cut lineage growth — the
  * d7 lesson: an unmaterialized loop re-executes every prior round per
  * reference and its plan grows quadratically.
  */
object Graph {

  /** Damped PageRank after exactly `iters` power-iteration rounds.
    *
    * Semantics (mirrored literally by the unrolled oracle SQL):
    * ranks start uniform at 1/n over the DISTINCT src ∪ dst node set;
    * each round every edge carries rank(src)/outdeg(src) to its dst
    * (parallel edges count — outdeg is edge multiplicity), and
    * `rank' = (1−d)/n + d·Σ inbound`. Dangling nodes (no out-edges)
    * leak their rank — the plain leaky variant, chosen because the
    * redistribution variant needs an extra global aggregate per round
    * and changes no RANKING on graphs whose dangling mass is uniform.
    *
    * The node count `n` is ONE count() pre-job (parquet-metadata cheap
    * for the common case), the same contract as d6's geometry count.
    *
    * @return (node, rank) — rank a plain double; callers cut to
    *         decimal for cross-engine comparison. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // materialized like contrib: the node set is referenced in every
    // round (and twice more for n and the initial vector) — left live
    // it would re-run the full edge scan + distinct per reference
    val nodes = Iter.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // static per-round payload: (src, dst, deg) — materialized once so
    // every round rejoins the SAME frame instead of re-deriving it
    val contrib = Iter.materialize(e.join(deg, "src"))
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val inbound = contrib
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("inb"))
      ranks = Iter.materialize(
        nodes.join(inbound, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit((1.0 - damping) / n) + lit(damping) *
              coalesce(col("inb"), lit(0.0))).as("rank")))
    }
    ranks
  }
}
