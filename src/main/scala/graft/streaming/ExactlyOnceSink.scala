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
    * yet. Returns the version written (or -1 when skipped). */
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
