package graft

import org.apache.spark.sql.SparkSession

import graft.queries.RebuildQueries
import graft.rebuild.RebuildJob

/** Local plan-inspection harness (test scope): prints the physical plan
  * of the solr rebuild and counts exchanges. */
object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = RebuildJob.rebuildSolr(spark,
      RebuildQueries.syntheticIssues(spark, d),
      RebuildQueries.syntheticPages(spark, d), "T")
      .queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange".r.findAllIn(plan).length)
    println(plan.linesIterator.map(_.take(120)).mkString("\n"))
    spark.stop()
  }
}
