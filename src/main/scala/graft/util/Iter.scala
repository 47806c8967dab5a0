package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame algorithms (connected
  * components, Lloyd rounds): every round must cut the plan or it
  * grows with the iteration count.
  *
  * Two forms, picked by session configuration:
  *  - a session WITH a checkpoint dir gets reliable `checkpoint()` —
  *    blocks are written to the checkpoint store, so losing an
  *    executor mid-loop recomputes from there instead of failing the
  *    query (the right trade on preemption-prone clusters);
  *  - otherwise `localCheckpoint()` — executor-storage blocks, no
  *    extra write, the right trade for local/test runs and stable
  *    clusters.
  */
object Iter {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** [[materialize]] for a loop's STATIC table: hash-partition and
    * sort on `keys` first (an EXPLICIT partition count, which AQE
    * never coalesces, so the layout is exactly murmur3(keys) mod n),
    * then checkpoint, then re-declare that layout on the returned
    * frame ([[org.apache.spark.sql.GraftDatasets.declareClustered]] —
    * plain checkpoints come back `UnknownPartitioning`). Every
    * subsequent join or aggregation keyed on `keys` reads the frame
    * exchange-free: the one-time shuffle here replaces a per-round
    * shuffle of the table — the difference between re-moving 100 TB
    * of edges every PageRank round and never moving them again. */
  def materializeClustered(df: DataFrame, keys: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = keys.map(org.apache.spark.sql.functions.col)
    val mat = materialize(
      df.repartition(n, cols: _*).sortWithinPartitions(cols: _*))
    org.apache.spark.sql.GraftDatasets.declareClustered(mat, keys,
      sorted = true)
  }

  /** Free the storage behind a frame returned by [[materialize]] once
    * the loop no longer references it: unpersists the checkpointed
    * RDD's blocks and deletes reliable-checkpoint files. Without this
    * a long run (thousands of BPE merge rounds, a slow-mixing
    * PageRank) pins one full copy of the iterated table PER ROUND —
    * storage grows linearly with the iteration count.
    *
    * Contract: pass ONLY frames that came straight out of
    * [[materialize]] (their plan is a single checkpoint-backed leaf);
    * on any other frame the leaf scan may be shared state this would
    * yank from under live frames. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      case _ => ()
    }
}
