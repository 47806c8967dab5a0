package graft

import org.apache.spark.sql.functions._

/** Round-15 measurement harness (dev-only; excluded from LoC, like
  * R11–R14Scratch). Run pieces via
  * `sbt 'Test/runMain graft.R15Scratch <what> <args...>'`. */
object R15Scratch {
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
      case "e14sweep" =>
        // TRIEST bounded-reservoir estimate on the FULL co-supplier
        // graph — the e-row form of g4sweep: where DOULION's sample
        // grows as p·t, the reservoir is FIXED at m whatever the
        // stream length; sweep m to price the accuracy/memory trade.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val m = if (args.length > 2) args(2).toInt else 100000
        val li = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_suppkey") < col("b.l_suppkey"))
          .select(col("a.l_suppkey").as("s1"),
            col("b.l_suppkey").as("s2"))
        var row: org.apache.spark.sql.Row = null
        val t = (1 to 2).map(_ => time {
          row = graft.streaming.TriangleStream
            .triangleEstimateReservoir(e, "s1", "s2", m).head()
        }).min
        println(f"e14sweep $d m=$m seen=${row.getLong(0)} " +
          f"sampled_tri=${row.getLong(2)} est=${row.getLong(3)} " +
          f"wall(min2)=$t%.2f s")
      case "cmpsweep" =>
        // gate-index compaction: an append-churned embed-gate
        // artifact's file count and LOAD cost (the collect a gate
        // restart pays) before/after compactEmbedGateIndex.
        import graft.streaming.IngestGate
        val nVecs = if (args.length > 1) args(1).toInt else 100000
        val appends = if (args.length > 2) args(2).toInt else 50
        val dim = 64
        def vecs(seed: Long, n: Int) = spark.range(n)
          .select((col("id") + seed * 10000000L).as("vec_id"),
            transform(sequence(lit(1), lit(dim)),
              i => sin(col("id") * i * (seed + 1)).cast("float"))
              .as("embedding"))
        IngestGate.writeEmbedGateIndex(spark, vecs(0, nVecs),
          "embedding", "r15_cmp_idx", bands = 16, bits = 12)
        (1 to appends).foreach { a =>
          IngestGate.appendEmbedGateIndex(spark,
            vecs(a.toLong, nVecs / appends), "embedding", "r15_cmp_idx")
        }
        def files(): Int = new java.io.File(
            spark.conf.get("spark.sql.warehouse.dir")
              .stripPrefix("file:"), "r15_cmp_idx")
          .listFiles().count(_.getName.endsWith(".parquet"))
        def load(): Double = (1 to 3).map(_ => time {
          spark.table("r15_cmp_idx").collect()
        }).min
        val fBefore = files(); val tBefore = load()
        val tc = time {
          IngestGate.compactEmbedGateIndex(spark, "r15_cmp_idx")
        }
        val fAfter = files(); val tAfter = load()
        println(f"cmpsweep vecs=${nVecs + nVecs} appends=$appends " +
          f"files $fBefore -> $fAfter  load(min3) $tBefore%.2f s -> " +
          f"$tAfter%.2f s  compact_cost=$tc%.2f s")
      case other =>
        System.err.println(s"unknown scratch target '$other'")
        sys.exit(2)
    }
    spark.stop()
  }
}
