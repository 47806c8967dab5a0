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
}
