package graft

import org.apache.spark.sql.SparkSession

/** Round-16 evidence dump for plans hidden behind checkpoints: the KN
  * scoring frame with and without the bigram materialization, written
  * to plans/r16/ so the corpus-scan-count claim is checkable.
  *
  * Usage: sbt "Test/runMain graft.R16PlanDump [sfDir]"
  */
object R16PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.util.Tables.documents(spark, sfDir)
    def dump(name: String, mat: Boolean): Unit = {
      val df = graft.operators.Curation.knBigramScore(docs, "doc_id",
        "text", materializeBigrams = mat)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r16/$name"), txt.getBytes("UTF-8"))
      val scans = "Scan parquet".r.findAllIn(txt).length
      println(s"[dump] $name scans=$scans")
    }
    dump("t14_kn_scoring_before.txt", mat = false)
    dump("t14_kn_scoring_after.txt", mat = true)
    spark.stop()
  }
}
