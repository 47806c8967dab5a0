package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Idempotent parquet sink for `foreachBatch` — the missing half of
  * exactly-once streaming output.
  *
  * Structured Streaming's checkpoint makes the SOURCE side exactly-once
  * (each file/offset is delivered in exactly one batch id, and a batch
  * id replays with identical contents after a crash), but `foreachBatch`
  * itself is only at-least-once: a crash between the sink write and the
  * checkpoint commit re-runs the batch, and a naive `append` would
  * duplicate every row of the replayed batch. This sink closes the gap
  * with the standard batch-id commit protocol (the same idea as
  * Spark's own FileStreamSink metadata log): each batch lands in its
  * own `batch=<id>` partition directory, a replayed id is detected via
  * the directory's `_SUCCESS` marker and SKIPPED — correct precisely
  * because replays carry identical data — and a partial directory from
  * a mid-write crash (no marker) is overwritten atomically-enough for
  * parquet readers (mode=overwrite rewrites the directory).
  *
  * Readers consume `out/` as one partitioned parquet table
  * (`batch` becomes a partition column). At 100 TB cadence the
  * per-batch directories double as retention units — drop old batch
  * partitions without touching the stream.
  */
object ExactlyOnceSink {

  /** `foreachBatch` body: write `df` under `out/batch=<batchId>`,
    * skipping ids that already committed (crash-replay). Returns true
    * when the batch was written, false when skipped. */
  def parquetBatch(out: String)(df: DataFrame, batchId: Long): Boolean = {
    val dir = new Path(out, s"batch=$batchId")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dir, "_SUCCESS"))) false
    else {
      df.write.mode("overwrite").parquet(dir.toString)
      true
    }
  }

  /** `foreachBatch` body for streaming CDC apply: MERGE each arriving
    * micro-batch into the versioned lake table under `lakeDir` with
    * [[graft.operators.Layout.upsert]] — batch rows replace matched
    * keys copy-on-write, and the new table version lands in its own
    * `v=<batchId>` directory whose `_SUCCESS` marker makes the apply
    * idempotent under crash-replay (the [[parquetBatch]] protocol
    * lifted from append to merge: a replayed id re-derives the SAME
    * version from the SAME predecessor and identical batch data, so
    * skipping it is correct). Readers always consume the highest
    * committed version; older versions double as time travel /
    * retention units.
    *
    * Batches must carry unique keys ([[graft.operators.Layout.upsert]]
    * contract); `seed` is the initial table when no version exists
    * yet. Returns the version written (or -1 when skipped).
    *
    * COST CONTRACT: each batch reads the full previous version and
    * writes a full new copy — O(lake) read+write per micro-batch, and
    * disk grows by one lake copy per batch until [[vacuumVersions]]
    * prunes old versions. That is the right trade only for SMALL
    * versioned tables (dimension/config lakes) or slow cadences where
    * the time-travel copies are the point. For a large lake at
    * streaming cadence use [[upsertBatchInPlace]]: partition-pruned
    * reads + dynamic-overwrite writes touch only the partitions the
    * batch lands in. */
  def upsertBatch(lakeDir: String, keyCols: Seq[String],
      seed: DataFrame)(df: DataFrame, batchId: Long): Long = {
    val spark = df.sparkSession
    val base = new Path(lakeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(base, s"v=$batchId")
    if (fs.exists(new Path(dir, "_SUCCESS"))) -1L
    else {
      val prev = latestVersion(spark, lakeDir)
        .map { case (_, p) => spark.read.parquet(p) }
        .getOrElse(seed)
      graft.operators.Layout.upsert(prev, df, keyCols)
        .write.mode("overwrite").parquet(dir.toString)
      batchId
    }
  }

  /** Retention for [[upsertBatch]] lakes: delete all but the newest
    * `keep` committed versions, plus any UNcommitted `v=` directory
    * older than the latest committed one (a partial write a later
    * batch already superseded — a newer-than-latest partial is left
    * alone, it may be a write in flight). Run it from the same
    * `foreachBatch` body after a successful apply, or on a side
    * cadence; readers pinned to a vacuumed version must re-resolve
    * [[latestVersion]]. Returns the number of directories removed. */
  def vacuumVersions(spark: org.apache.spark.sql.SparkSession,
      lakeDir: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the latest version")
    val base = new Path(lakeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0
    val versions = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong, s.getPath,
        fs.exists(new Path(s.getPath, "_SUCCESS"))))
      .sortBy(_._1)
    val committed = versions.filter(_._3)
    if (committed.isEmpty) return 0
    val latest = committed.last._1
    val keepIds = committed.takeRight(keep).map(_._1).toSet
    val victims = versions.filter { case (id, _, ok) =>
      (ok && !keepIds.contains(id)) || (!ok && id < latest) }
    victims.foreach { case (_, p, _) => fs.delete(p, true) }
    victims.size
  }

  /** In-place partitioned CDC apply — the 100 TB form of
    * [[upsertBatch]]: the lake lives ONCE under `lakeDir/data`,
    * partitioned by `partCol`, and each micro-batch rewrites ONLY the
    * partitions it touches (partition-pruned read of the previous
    * state + dynamic partition overwrite), so per-batch cost is
    * O(touched partitions), not O(lake), and disk holds one copy.
    *
    * Exactly-once comes from idempotence-BY-CONTENT plus a commit
    * marker plus ATOMIC per-partition swaps: the merged output is
    * staged under `_stage/<id>` (so the pruned read of the previous
    * state never overlaps the write), then each touched partition
    * flips into `data/` by directory rename — old parked in
    * `_old/<id>` first — so a partition's FILE SET is always fully-old
    * or fully-new, never torn. (Atomicity is per RENAME, for
    * crash-replay: between the park and the swap-in a concurrent
    * reader of `data/` would see that partition absent — readers that
    * need point-in-time consistency during writes belong on the
    * versioned [[upsertBatch]], whose committed `v=` directories are
    * immutable.) A replayed batch id then
    * re-derives each touched partition from (its current state —
    * old or new, both converge because
    * [[graft.operators.Layout.upsert]] applied twice is the same as
    * once — identical batch rows); the one non-atomic window (between
    * the park and the swap-in renames) leaves the partition ONLY in
    * `_old/<id>`, which replay restores before merging. The
    * `_commits/<id>` marker merely skips the re-work once the apply
    * fully committed. No time travel: old partition states are gone
    * after commit ([[upsertBatch]] is the versioned form).
    *
    * `partCol` must be a PURE FUNCTION OF THE KEY (stable across
    * updates of a key, e.g. a key hash bucket or an immutable ingest
    * date): a key that moved partitions would leave its stale copy in
    * the old partition — this is the standard partitioned-MERGE
    * constraint, enforced here only by contract. Returns true when
    * the batch was applied, false when skipped as already committed. */
  def upsertBatchInPlace(lakeDir: String, keyCols: Seq[String],
      partCol: String)(df: DataFrame, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val base = new Path(lakeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(base, s"_commits/$batchId")
    val stage = new Path(base, s"_stage/$batchId")
    val parked = new Path(base, s"_old/$batchId")
    if (fs.exists(marker)) {
      // a crash after the marker but before cleanup leaves superseded
      // stage/old leftovers — drop them on the skip path
      fs.delete(stage, true)
      fs.delete(parked, true)
      false
    } else {
      val dataDir = new Path(base, "data")
      // crash recovery: a prior attempt of THIS batch may have parked
      // a partition in _old without completing its swap-in — restore
      // it so the merge below reads a complete state. (A partition in
      // both places means the swap-in finished; the parked copy is
      // superseded.)
      if (fs.exists(parked)) {
        fs.listStatus(parked).foreach { s =>
          val live = new Path(dataDir, s.getPath.getName)
          if (!fs.exists(live)) fs.rename(s.getPath, live)
          else fs.delete(s.getPath, true)
        }
        fs.delete(parked, true)
      }
      // bounded driver state: one row per partition the batch touches
      val touched = df.select(df(partCol)).distinct().collect()
        .map(_.get(0))
      val merged =
        if (!fs.exists(dataDir)) df
        else {
          val prev = spark.read.parquet(dataDir.toString)
            .filter(org.apache.spark.sql.functions.col(partCol)
              .isin(touched.toIndexedSeq: _*))
          graft.operators.Layout.upsert(prev, df, keyCols)
        }
      fs.delete(stage, true)
      merged.write.mode("overwrite")
        .partitionBy(partCol)
        .parquet(stage.toString)
      // atomic per-partition swap: park the old directory, rename the
      // staged one in — a directory rename is atomic, so a partition
      // is fully-old or fully-new at every instant
      fs.mkdirs(parked)
      fs.mkdirs(dataDir)
      fs.listStatus(stage).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(s"$partCol="))
        .foreach { s =>
          val live = new Path(dataDir, s.getPath.getName)
          if (fs.exists(live))
            fs.rename(live, new Path(parked, s.getPath.getName))
          fs.rename(s.getPath, live)
        }
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      fs.delete(stage, true)
      fs.delete(parked, true)
      true
    }
  }

  /** Highest committed `v=<id>` version under `lakeDir`, as
    * (version, path). */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
      lakeDir: String): Option[(Long, String)] = {
    val base = new Path(lakeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong,
        s.getPath.toString))
      .filter { case (_, p) =>
        fs.exists(new Path(new Path(p), "_SUCCESS")) }
      .sortBy(_._1).lastOption
  }
}
