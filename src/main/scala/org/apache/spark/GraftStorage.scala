package org.apache.spark

import org.apache.spark.storage.RDDBlockId

/** Synchronous block-size reads (same-package accessor, the
  * GraftColumns/GraftDatasets pattern).
  *
  * `SparkContext.getRDDStorageInfo` is served from the listener-driven
  * AppStatusStore, which is updated ASYNCHRONOUSLY: immediately after
  * an eager `localCheckpoint()` the store may not have seen the block
  * updates yet, so a size probe returns nothing and callers silently
  * fall back to estimated statistics — making the broadcast-vs-merge
  * join shape of every iterative algorithm nondeterministic under
  * load. This asks the BlockManagerMaster directly (a synchronous RPC
  * to the source of truth), so a block that exists is always seen.
  */
object GraftStorage {

  /** Sum of max(mem, disk expanded) byte sizes of `rddId`'s persisted
    * blocks, read synchronously from the block-manager master. Blocks
    * replicated on several executors are counted once (per-copy size).
    * Returns 0 when no partition of the RDD is persisted (e.g. a
    * reliable checkpoint, which writes files instead). */
  def rddBlockBytes(sc: SparkContext, rddId: Int,
      numPartitions: Int): BigInt = {
    val master = SparkEnv.get.blockManager.master
    (0 until numPartitions).foldLeft(BigInt(0)) { (acc, i) =>
      val statuses =
        master.getBlockStatus(RDDBlockId(rddId, i), askStorageEndpoints = true)
      if (statuses.isEmpty) acc
      else acc + BigInt(statuses.valuesIterator
        .map(s => s.memSize + s.diskSize).max)
    }
  }
}
