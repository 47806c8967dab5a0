package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpoint-metadata bridge (same-package accessor, the
  * [[GraftColumns]] pattern): `Dataset.checkpoint`/`localCheckpoint`
  * returns a `LogicalRDD` with `UnknownPartitioning`, so an iterative
  * algorithm that carefully repartitioned its static table before the
  * checkpoint cut still pays a full re-shuffle of that table every
  * round — Catalyst has no way to know the blocks are already hash
  * placed. This re-declares what the caller just made physically true.
  */
object GraftDatasets {

  /** Rebuild a checkpoint-backed frame with its REAL clustering
    * declared: hash-partitioned on `keys` across the RDD's own
    * partition count, sorted within partitions when `sorted`. The
    * caller must have made that layout true before materializing
    * (explicit `repartition(n, keys)` — which AQE never coalesces —
    * plus `sortWithinPartitions`); declaring a layout the blocks do
    * not have silently corrupts every co-partitioned join and
    * aggregation downstream. Frames whose plan is not a single
    * checkpoint scan are returned unchanged. */
  def declareClustered(df: DataFrame, keys: Seq[String],
      sorted: Boolean): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"declareClustered: no column '$k' in ${lr.output.map(_.name)}")))
        val part = HashPartitioning(attrs, lr.rdd.getNumPartitions)
        val ord =
          if (sorted) attrs.map(a => SortOrder(a, Ascending)) else Nil
        classic.Dataset.ofRows(ds.sparkSession,
          LogicalRDD(lr.output, lr.rdd, part, ord, lr.isStreaming,
            lr.stream)(ds.sparkSession, None, None))
      case _ => df
    }
  }
}
