package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement harness (guide §1): runs ONE query end to end and prints
  * a per-Spark-job wall-time table (job id, seconds, description /
  * callsite) plus per-stage task totals, so the cost of a multi-action
  * query (iterative graph rounds, model-fit pre-passes, checkpoint
  * materializations) is attributable job by job. Purely an observer —
  * it times the same `fn(spark, sfDir).count()` action the bench times,
  * never caches, and changes no query.
  *
  * Usage: sbt "runMain graft.Profile <query> [sfDir] [trials]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [sfDir] [trials]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))

    case class Job(id: Int, start: Long, var end: Long = 0L,
        var desc: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap[Int, Job]()
    val stageTasks =
      scala.collection.mutable.LinkedHashMap[Int, (Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = Job(js.jobId, js.time, desc = d)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTasks.synchronized {
          val info = sc.stageInfo
          stageTasks(info.stageId) =
            (info.numTasks, info.taskMetrics.executorRunTime,
              info.name.take(90))
        }
    }

    // warmup pass (same convention as Bench: JIT lands outside timing)
    try { fn(spark, "/root/testdata/sf0.001").count() }
    catch { case _: Throwable => () }

    var best = Double.MaxValue
    for (t <- 1 to trials) {
      jobs.clear(); stageTasks.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; give it a moment to drain
      Thread.sleep(300)
      println(f"== trial $t: $secs%.3f s, rows=$n, jobs=${jobs.size}")
      if (secs < best) {
        best = secs
        val snap = jobs.values.toSeq.sortBy(-_.id).sortBy(j => -(j.end - j.start))
        snap.take(30).foreach { j =>
          println(f"  job ${j.id}%3d  ${(j.end - j.start) / 1e3}%7.3f s  ${j.desc.take(110)}")
        }
        val totalTask = stageTasks.values.map(_._2).sum
        println(f"  stages=${stageTasks.size} total-executor-run=${totalTask / 1e3}%.2f s (sum over tasks)")
        stageTasks.toSeq.sortBy(-_._2._2).take(15).foreach {
          case (sid, (nt, rt, nm)) =>
            println(f"  stage $sid%4d  ${rt / 1e3}%7.2f s  $nt%3d tasks  $nm")
        }
      }
    }
    println(f"== best: $best%.3f s")
    spark.stop()
  }
}
