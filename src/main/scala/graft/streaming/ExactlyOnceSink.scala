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
}
