package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.util.Tables

/** Local profiling harness (test scope, not shipped): isolates the b2
  * encode's merge-fold cost from its scan/agg baseline. Run with
  * `sbt "Test/runMain graft.BpeScratch"`. */
object BpeScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, d)
    docs.count() // warmup
    time("scan")(docs.count())

    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "4").toInt
    var merges: Seq[(String, String)] = Nil
    time(s"train($nMerges)") {
      merges = Bpe.bpeMerges(docs, "text", nMerges)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      merges.size.toLong
    }

    // baseline: split-to-chars only, no merge folds (merges = Nil)
    time("encode-0-merges")(
      Bpe.bpeEncode(docs, "text", Nil)
        .select(sum(size(col("tokens")))).first().getLong(0))
    // the shipped path: K nested folds
    for (k <- Seq(1, 2, nMerges)) {
      time(s"encode-$k-merges")(
        Bpe.bpeEncode(docs, "text", merges.take(k))
          .select(sum(size(col("tokens")))).first().getLong(0))
    }
    // the full b2 tail: md5-of-token-stream agg on top (forced via
    // max(tok_md5) — a bare count() would prune the md5 away)
    time("b2-full-agg") {
      Bpe.bpeEncode(docs, "text", merges)
        .select(col("doc_id"),
          md5(concat_ws(" ", col("tokens"))).as("tok_md5"))
        .agg(max(col("tok_md5"))).first()
      docs.count()
    }
    spark.stop()
  }
}
