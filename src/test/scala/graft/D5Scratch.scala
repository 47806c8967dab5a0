package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.util.Tables

/** Stage bisect for d5_ngram_jaccard at sf1 (test scope, not shipped).
  * Run with `sbt "Test/runMain graft.D5Scratch"`. */
object D5Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ShinglesImpl.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, d)
    docs.count() // warm

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val blocked = docs.select(col("doc_id").as("id"), col("text"))
        .withColumn("sh", expr("word_shingles(text, 3)"))
        .withColumn("bh", array_min(Dedup.baseHashes(col("sh"))))
      time("shingle+block")(blocked.count())
      time("bucket histogram")(blocked.groupBy("bh").count()
        .agg(max("count"), count(lit(1))).collect()(0).getLong(1))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      time("full d5")(pairs.count())
    }
    // bucket-size distribution (top 10)
    val blocked = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", expr("word_shingles(text, 3)"))
      .withColumn("bh", array_min(Dedup.baseHashes(col("sh"))))
    blocked.groupBy("bh").count().orderBy(desc("count")).limit(10)
      .collect().foreach(r => println(s"BUCKET ${r.getLong(1)}"))
    spark.stop()
  }
}
