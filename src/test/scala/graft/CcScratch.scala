package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.util.Tables

/** Local profiling harness (test scope, not shipped): per-phase timing
  * for dupClusters. Run with `sbt "Test/runMain graft.CcScratch"`. */
object CcScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warmup
    Tables.documents(spark, d).count()
    val docs = Tables.documents(spark, d)

    val pairs = time("pairs (cold)") {
      val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.7)
      p.count(); p
    }
    println(s"  n_pairs = ${pairs.count()}")

    val sym = time("sym checkpoint") {
      pairs.select(col("id_a").as("id"), col("id_b").as("nbr"))
        .union(pairs.select(col("id_b").as("id"), col("id_a").as("nbr")))
        .localCheckpoint()
    }
    var labels = time("init labels") {
      sym.groupBy("id")
        .agg(least(min(col("nbr")), first(col("id"))).as("label"))
        .localCheckpoint()
    }
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      time(s"round $iter") {
        val nbrMin = sym
          .join(labels.withColumnRenamed("id", "nbr")
            .withColumnRenamed("label", "nbr_label"), "nbr")
          .groupBy("id").agg(min(col("nbr_label")).as("nbr_label"))
        val next = labels.join(nbrMin, "id")
          .select(col("id"),
            least(col("label"), col("nbr_label")).as("label"),
            (col("nbr_label") < col("label")).as("changed"))
          .localCheckpoint()
        converged = next.filter(col("changed")).isEmpty
        labels = next.drop("changed")
      }
      iter += 1
    }
    println(s"  iterations = $iter")
    spark.stop()
  }
}
