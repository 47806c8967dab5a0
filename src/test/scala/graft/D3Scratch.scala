package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.util.Tables

/** d3 scale measurement harness (test scope, not shipped): times the
  * n-aware-geometry LSH near-dup path and prints bucket-population
  * telemetry for the OLD fixed 4×4 banding vs the n-aware one — the
  * evidence the round-8 geometry fix owes (VERDICT r8/r9 item 2).
  * Run with `sbt "Test/runMain graft.D3Scratch"`;
  * SPARK_GRAFT_SF_DIR picks the corpus. */
object D3Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d)
    val n = docs.count() // also the warmup scan
    val (bands, rows) = Dedup.minhashGeometry(n, 0.8)
    println(s"CORPUS $d n=$n sizedGeometry=${bands}x$rows")

    def stats(tag: String, numHashes: Int, b: Int): Unit = {
      val t0 = System.nanoTime()
      val r = Dedup.lshBucketStats(docs, "doc_id", "text",
        k = 3, numHashes = numHashes, bands = b).collect()(0)
      println(f"STATS $tag%-14s n_buckets=${r.getLong(0)}%9d " +
        f"max_bucket=${r.getLong(1)}%7d " +
        s"p50_p90_p99=${r.getSeq[Double](2).mkString("[", ",", "]")} " +
        f"pair_expansion=${r.getLong(3)}%12d " +
        f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    // BEFORE: the fixed 4x4 banding that scaled 9.9x per 10x data
    stats("fixed-4x4", 16, 4)
    // AFTER: the n-aware geometry the d3 path now auto-sizes
    stats(s"sized-${bands}x$rows", bands * rows, bands)

    for (trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = Dedup.lshNearDupPairsSized(docs, "doc_id", "text",
        k = 3, threshold = 0.8).count()
      println(f"D3 trial$trial ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        s"($pairs pairs)")
    }
    spark.stop()
  }
}
