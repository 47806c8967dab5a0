package org.apache.spark.sql

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-split estimation from the ANALYZED plan (same-package
  * accessor, the GraftDatasets pattern).
  *
  * `Tables.fanOut` needs "will this scan produce at least the
  * session's parallelism in partitions?". Probing via
  * `df.rdd.getNumPartitions` answers it exactly but forces a full
  * non-AQE physical planning + RDD instantiation per call — a pure
  * driver tax paid on every invocation, including ones where the
  * answer is obviously "yes" (large production inputs). This reads the
  * file-index metadata the analyzed plan already holds and replays
  * Spark's own split arithmetic (`FilePartition.maxSplitBytes`), which
  * costs no planning and no jobs.
  */
object GraftScans {

  /** Estimated file-scan partition count of a SCAN-ROOTED frame:
    * every leaf must be a file-source relation (the fanOut contract),
    * else None (caller falls back to the exact probe). The estimate
    * replays maxSplitBytes = min(maxPartitionBytes, max(openCost,
    * totalBytes / minPartitionNum)) and bin arithmetic
    * ceil(totalBytes / maxSplitBytes); greedy bin packing can emit a
    * few more partitions than this, never fewer in the regimes that
    * matter (many large files, or a handful of small ones), and a
    * boundary miss only toggles a repartition that is a near no-op. */
  def scanSplitEstimate(df: DataFrame): Option[Long] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val session = ds.sparkSession
    val leaves = ds.queryExecution.analyzed.collectLeaves()
    val rels = leaves.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
    }
    if (rels.isEmpty || rels.size != leaves.size) None
    else {
      val conf = session.sessionState.conf
      val openCost = conf.filesOpenCostInBytes
      val maxPartitionBytes = conf.filesMaxPartitionBytes
      val minPartitionNum = conf.filesMinPartitionNum
        .getOrElse(session.sparkContext.defaultParallelism)
      val totalBytes = rels.map(r =>
        r.location.sizeInBytes +
          openCost * math.max(r.location.inputFiles.length, 1)).sum
      val bytesPerCore = totalBytes / math.max(minPartitionNum, 1)
      val maxSplitBytes =
        math.min(maxPartitionBytes, math.max(openCost, bytesPerCore))
      Some(math.max(
        (totalBytes + maxSplitBytes - 1) / math.max(maxSplitBytes, 1), 1L))
    }
  }
}
