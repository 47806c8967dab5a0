package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture tool (guide §1/§7.2): dumps `.explain("formatted")` for
  * the named queries (or all of them) to <outDir>/<query>.txt so plan
  * shapes (Exchange count, join strategy, PushedFilters/ReadSchema) can
  * be diffed before/after an optimization and committed as evidence.
  *
  * Usage: sbt "runMain graft.Plans <outDir> [query,query,...] [sfDir]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Plans <outDir> [queries] [sfDir]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val names: Set[String] =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSet
      else SparkEntry.queries.keySet
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            new java.io.File(outDir, s"$name.txt").toPath,
            txt.getBytes("UTF-8"))
          println(s"[plans] wrote $name")
        } catch { case e: Throwable =>
          println(s"[plans] FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
