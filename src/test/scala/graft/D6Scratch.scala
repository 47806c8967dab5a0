package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Local profiling harness (test scope, not shipped): d6 embedding LSH
  * cost across thresholds and scale factors — separates the
  * recall-holding geometry's intrinsic low-threshold cost (bands ~
  * (n/32)^0.7 at cos 0.35, LSH ρ→1) from the production near-dup
  * regime (cos 0.8+, bands ~ n^0.33). Run with
  * `sbt "Test/runMain graft.D6Scratch [sfDir]"`. */
object D6Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val thresholds = if (args.length > 1)
      args(1).split(",").toSeq.map(_.toDouble) else Seq(0.35, 0.8, 0.9)
    val e = graft.util.Tables.embeddings(spark, d)
    val n = e.count()
    println(s"corpus n = $n")
    for (threshold <- thresholds; trial <- 1 to 2) {
      val (bands, bits) = Similarity.rhpGeometry(n, threshold)
      val t0 = System.nanoTime()
      val pairs = Similarity.lshNearDupPairs(e, "vec_id", "embedding",
        bands, bits, threshold).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"threshold $threshold%.2f geometry ${bands}%4dx$bits%-2d " +
        f"trial $trial: $secs%7.2f s  ($pairs pairs)")
    }
    spark.stop()
  }
}
