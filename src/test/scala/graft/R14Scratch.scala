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
      case "e11cut" =>
        // probe the stream-side xent distribution to pick the e11
        // row's literal threshold
        import graft.operators.Curation
        import graft.streaming.IngestGate
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
        val docs = Tables.documents(spark, d)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val model = Curation.knGateModel(corpus, "doc_id", "text",
          topN = 2000)
        val xs = docs.filter(col("doc_id") % 5 === 0)
          .select(IngestGate.knScoreCols(model, "text")._2.as("x"))
          .collect().map(_.getLong(0)).sorted
        println(s"e11cut $d n=${xs.length} min=${xs.head} " +
          s"p25=${xs(xs.length / 4)} median=${xs(xs.length / 2)} " +
          s"p75=${xs(3 * xs.length / 4)} max=${xs.last} " +
          s"lnUnseenE6=${math.floor(-model.lnUnseen * 1e6).toLong}")
      case "knsweep" =>
        // decade sweep for the e11 family: bounded-model TRAIN wall
        // (full KN model + top-N collect) and per-ingest GATE wall
        // (stateless projection over the stream split)
        import graft.operators.Curation
        import graft.streaming.IngestGate
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val docs = Tables.documents(spark, d)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val nC = corpus.count(); val nB = batch.count()
        var model: Curation.KnGateModel = null
        val tTrain = (1 to 2).map(_ => time {
          model = Curation.knGateModel(corpus, "doc_id", "text",
            topN = 2000)
        }).min
        var kept = 0L
        val tGate = (1 to 5).map(_ => time {
          kept = IngestGate.knGate(batch, model, "text", 3410000L)
            .count()
        }).min
        println(f"knsweep $d corpus=$nC batch=$nB kept=$kept " +
          f"train(min2)=$tTrain%.2f s gate(min5)=$tGate%.3f s")
      case "phashsweep" =>
        // phashGateExact at a synthetic 10^6-fingerprint lake: the
        // literal-map form scanned ~4e6 keys per band lookup; the
        // native hash index should gate a 1e5-image stream in O(s)
        import graft.streaming.IngestGate
        import spark.implicits._
        val nLake = if (args.length > 1) args(1).toInt else 1000000
        val nStream = if (args.length > 2) args(2).toInt else 100000
        val lake = spark.range(nLake.toLong)
          .select(xxhash64(col("id")).as("phash"))
        val stream = spark.range(nStream.toLong)
          .select(xxhash64(col("id") + lit(500000000L)).as("phash"))
        var kept = 0L
        val t = (1 to 3).map(_ => time {
          kept = IngestGate.phashGateExact(stream, lake).count()
        }).min
        println(f"phashsweep lake=$nLake stream=$nStream kept=$kept " +
          f"gate(min3)=$t%.2f s")
      case "embedsweep" =>
        // e12 gate: index BUILD (lake band + collect) vs per-ingest
        // GATE pass over a 64-dim synthetic lake
        import graft.streaming.IngestGate
        val nLake = if (args.length > 1) args(1).toInt else 100000
        val nStream = if (args.length > 2) args(2).toInt else 10000
        def vecs(n: Int, off: Long) = {
          val base = spark.range(n.toLong)
            .select((col("id") + lit(off)).as("vec_id"))
          base.select(col("vec_id"),
            org.apache.spark.sql.functions.transform(
              org.apache.spark.sql.functions.sequence(lit(1), lit(64)),
              k => (org.apache.spark.sql.functions
                .xxhash64(col("vec_id"), k) % 1000).cast("float"))
              .as("embedding"))
        }
        val lake = graft.util.Iter.materialize(vecs(nLake, 0L))
        val stream = graft.util.Iter.materialize(
          vecs(nStream, 1000000000L))
        // size the banding like the batch family does — a fixed 16x4
        // saturates its 16-key bands at 10^5 vectors and degenerates
        // to brute force
        val (bands, bits) =
          graft.operators.Similarity.rhpGeometry(nLake.toLong, 0.95)
        var kept = 0L
        val t = (1 to 3).map(_ => time {
          kept = IngestGate.embedGate(stream, lake, "embedding", 0.95,
            bands = bands, bits = bits)
            .count()
        }).min
        println(f"embedsweep lake=$nLake stream=$nStream " +
          f"bands=$bands bits=$bits kept=$kept " +
          f"gate_incl_index(min3)=$t%.2f s")
      case "g3sweep" =>
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val li = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_suppkey") < col("b.l_suppkey"))
          .select(col("a.l_suppkey").as("s1"),
            col("b.l_suppkey").as("s2"))
        var total = 0L
        val t = (1 to 2).map(_ => time {
          total = graft.operators.Graph.triangleCount(e, "s1", "s2")
            .agg(sum(col("n_triangles"))).head().getLong(0) / 3
        }).min
        println(f"g3sweep $d triangles=$total wall(min2)=$t%.2f s")
      case "g4sweep" =>
        // DOULION at p on the FULL co-supplier graph — the scale path
        // where g3's exact output is itself the wall (g3sweep: 1.24B
        // triangles / 193 s at sf1)
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val p = if (args.length > 2) args(2).toDouble else 0.1
        val li = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_suppkey") < col("b.l_suppkey"))
          .select(col("a.l_suppkey").as("s1"),
            col("b.l_suppkey").as("s2"))
        var row: org.apache.spark.sql.Row = null
        val t = (1 to 2).map(_ => time {
          row = graft.operators.Graph
            .triangleCountApprox(e, "s1", "s2", p).head()
        }).min
        println(f"g4sweep $d p=$p sampled_edges=${row.getLong(0)} " +
          f"sampled_tri=${row.getLong(1)} est=${row.getLong(2)} " +
          f"wall(min2)=$t%.2f s")
      case other =>
        System.err.println(s"unknown scratch target '$other'")
        sys.exit(2)
    }
    spark.stop()
  }
}
