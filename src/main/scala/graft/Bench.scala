package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass (the flagship `entry` plus one tiny action) runs first
  * so JIT/classloading cost lands outside the timed region; queries then
  * run in sorted name order so timings are comparable across rounds.
  * Trials are interleaved at the BATTERY level (N full passes, per-query
  * min across passes) so a transient host stall poisons at most one
  * pass of each query, and a fixed-work canary timed throughout makes
  * any stall window visible in the emitted record itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: flagship query + every query once at the smallest scale
    // factor, untimed — JIT/codegen/classloading cost lands here, so the
    // timed section measures steady-state throughput (the quantity that
    // extrapolates to a long-running cluster job), not first-call warmup
    val warmDir = "/root/testdata/sf0.001"
    try {
      SparkEntry.entry(spark).count()
      if (new java.io.File(warmDir).isDirectory)
        SparkEntry.queries.foreach { case (_, fn) =>
          try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
        }
    } catch { case _: Throwable => () }

    // optional comma-separated query filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Best-of-N trials (default 2), INTERLEAVED AT THE BATTERY LEVEL:
    // the full battery runs N complete passes and each query takes its
    // minimum ACROSS passes. Back-to-back per-query trials (the old
    // scheme) cannot escape a multi-minute host stall — both trials of
    // every query inside the stall window are poisoned, which is
    // exactly what inflated the round-6 record 8x (a contiguous
    // alphabetical window at 5-60x while the rest matched round 5).
    // With whole-battery passes a stall has to span the entire run to
    // survive the per-query min.
    val trials = math.max(1, sys.env.get("SPARK_GRAFT_TRIALS")
      .flatMap(_.toIntOption).getOrElse(2))
    // Canary: a fixed-work no-op (sum over a 1M-row range, constant
    // regardless of sfDir) timed every `canaryEvery` queries. Its
    // samples ride the JSON record, so a stalled window is
    // machine-detectable IN the record: healthy samples are tightly
    // clustered milliseconds; a 10x+ outlier brackets the queries it
    // ran between. It measures scheduler+JVM health, not data work.
    val canaryEvery = 8
    val canarySamples = scala.collection.mutable.ArrayBuffer[Double]()
    def canary(): Unit = {
      val t0 = System.nanoTime()
      spark.range(1L << 20).selectExpr("sum(id)").collect()
      canarySamples += (System.nanoTime() - t0) / 1e9
    }
    // failed queries are named in the record instead of silently timed
    // as near-zero "successes" (a missing input table once read as a
    // 0.07 s query — 20x FASTER at 10x the data — in a scale battery)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val passTimes =
      scala.collection.mutable.Map[String, List[Double]]().withDefault(_ => Nil)
    for (_ <- 1 to trials) {
      selected.zipWithIndex.foreach { case ((name, fn), i) =>
        if (i % canaryEvery == 0) canary()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed += name }
        passTimes(name) = ((System.nanoTime() - t0) / 1e9) :: passTimes(name)
      }
    }
    val results = selected.map { case (name, _) => name -> passTimes(name).min }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val cSorted = canarySamples.sorted
    val cStats = if (cSorted.isEmpty) "null" else {
      val med = cSorted(cSorted.size / 2)
      s"""{"n":${cSorted.size},"min":${cSorted.head},"median":$med,"max":${cSorted.last}}"""
    }
    val cAll = canarySamples.map(v => f"$v%.4f").mkString("[", ",", "]")
    // long per-query line first, short summary line LAST: the driver
    // captures a bounded tail of stdout, so the machine-readable total
    // must live in the final bytes (round-5 records lost it to
    // truncation of the long line)
    println(s"""{"metric":"per_query","value":$total,"unit":"sec","queries":$qs,"canary_samples":$cAll,"sf":"$sfDir"}""")
    val slowest = results.maxByOption(_._2)
      .map { case (k, v) => "\"" + k + "\":" + v }.getOrElse("")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullRecord =
      s"""{"metric":"per_query","value":$total,"unit":"sec","n_queries":${results.size},"trials":$trials,"failed":$fails,"queries":$qs,"canary_samples":$cAll,"canary":$cStats,"sf":"$sfDir"}"""
    // the stdout tail has repeatedly truncated the head of the long
    // per-query line (rounds 5/8/9 each lost the a1–j12 prefix), so the
    // COMPLETE per-query map is also written to a committed file — the
    // durable record noise-vs-regression questions are answered from
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_SELF.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (fullRecord + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outFile: $e") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"trials":$trials,"failed":$fails,"slowest":{$slowest},"canary":$cStats,"bench_out":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
