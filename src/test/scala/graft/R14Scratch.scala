package graft

import org.apache.spark.sql.functions._

/** Round-14 measurement harness (dev-only; excluded from LoC, like
  * R11–R13Scratch). Run pieces via
  * `sbt 'Test/runMain graft.R14Scratch <what> <args...>'`. */
object R14Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    args.headOption.getOrElse("") match {
      case "d22split" =>
        // VERDICT r13 item 3: price the one-time gram-index WRITE and
        // the per-ingest PROBE separately (the battery row pays both
        // in-row to stay self-contained — the t9/j14 convention).
        // Also time d21 (corpus re-scanned per ingest) as the
        // no-index baseline the write amortizes against.
        import graft.operators.Dedup
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val docs = Tables.documents(spark, d)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val nC = corpus.count(); val nB = batch.count()
        val tbl = "r14_d22_gram_idx"
        var rows = 0L
        val tWrite = (1 to 2).map(_ => time {
          Dedup.writeGramIndex(corpus, "doc_id", "text", tbl)
        }).min
        val tProbe = (1 to 5).map(_ => time {
          rows = Dedup.incrementalExactSpansIndexed(
            spark, tbl, batch, "doc_id", "text").count()
        }).min
        val tD21 = (1 to 3).map(_ => time {
          rows = Dedup.incrementalExactSpans(
            batch, corpus, "doc_id", "text").count()
        }).min
        println(f"d22split $d corpus=$nC batch=$nB spans=$rows " +
          f"write(min2)=$tWrite%.2f s probe(min5)=$tProbe%.3f s " +
          f"d21_unindexed(min3)=$tD21%.2f s")
      case other =>
        System.err.println(s"unknown scratch target '$other'")
        sys.exit(2)
    }
    spark.stop()
  }
}
