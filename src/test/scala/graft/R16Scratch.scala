package graft

import org.apache.spark.sql.SparkSession

/** Round-16 plan/measure scratch (test scope): runs one declared query,
  * prints the post-execution adaptive plan (so ReusedExchange and AQE
  * join rewrites are visible) plus scan/exchange/reuse counts.
  *
  * Usage: sbt "Test/runMain graft.R16Scratch <query> [sfDir] [cpus]"
  */
object R16Scratch {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: R16Scratch <query> [sfDir] [cpus]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() runs df's OWN QueryExecution, so the toString below is
    // the post-execution adaptive plan (isFinalPlan=true) — a noop
    // write would execute a separate QueryExecution and leave this one
    // unfinalized
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    def c(n: String) = n.r.findAllIn(plan).length
    println(s"SCANS=${c("FileScan parquet")} EXCHANGES=${c("Exchange")} " +
      s"REUSED_EXCH=${c("ReusedExchange")} REUSED_SUBQ=${c("ReusedSubquery")} " +
      s"BHJ=${c("BroadcastHashJoin")} SMJ=${c("SortMergeJoin")}")
    println(plan.linesIterator.map(_.take(140)).mkString("\n").take(12000))
    spark.stop()
  }
}
