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
      case "l5sweep" =>
        // next-fit sequence packing at corpus scale: wall, pack count
        // and FILL EFFICIENCY (the quantity padding wastes) at a
        // training-realistic budget, sweeping shard count to show
        // packing is shard-parallel with stable efficiency.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val nShards = if (args.length > 2) args(2).toInt else 256
        val budget = if (args.length > 3) args(3).toLong else 2048L
        val docs = Tables.documents(spark, d).select(col("doc_id"),
          (col("doc_id") % nShards).as("shard"),
          graft.functions.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("len"))
        var packs = 0L; var docsN = 0L; var toks = 0L
        val t = (1 to 2).map(_ => time {
          val r = graft.operators.Layout.packSequences(
            docs, "doc_id", "len", "shard", budget)
          val agg = r.agg(
            countDistinct(col("shard"), col("pack_seq")).as("packs"),
            count(lit(1)).as("docs"), sum(col("len")).as("toks"))
            .head()
          packs = agg.getLong(0); docsN = agg.getLong(1)
          toks = agg.getLong(2)
        }).min
        println(f"l5sweep $d shards=$nShards budget=$budget " +
          f"docs=$docsN packs=$packs fill=${
            toks.toDouble / (packs * budget) * 100}%.1f%% " +
          f"wall(min2)=$t%.2f s")
      case "hhsweep" =>
        // e15 heavy-hitter fold at corpus scale: the one corpus-sized
        // exchange vs sketch-sized tail; sweep w to show cost is
        // scan-bound, not geometry-bound.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val w = if (args.length > 2) args(2).toInt else 1024
        val theta = if (args.length > 3) args(3).toInt else 8
        val ev = Tables.events(spark, d).select(
          dayofmonth(col("ts")).cast("long").as("batch"),
          col("user_id"))
        var rows = 0L
        val t = (1 to 2).map(_ => time {
          rows = graft.streaming.HeavyHitterStream.heavyHittersBatch(
            ev, "user_id", "batch", d = 4, w = w,
            thetaPermille = theta, seed = "e15").count()
        }).min
        println(f"hhsweep $d w=$w theta=$theta emitted=$rows " +
          f"wall(min2)=$t%.2f s")
      case "hllsweep" =>
        // e16 distinct gate at corpus scale: one corpus exchange into
        // 64 registers — the wall should be the scan, nothing else.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val ev = Tables.events(spark, d).select(
          dayofmonth(col("ts")).cast("long").as("batch"),
          col("user_id"))
        var rows = 0L
        val t = (1 to 2).map(_ => time {
          rows = graft.streaming.CardinalityStream
            .distinctEstimateBatch(ev, "user_id", "batch", "e16")
            .count()
        }).min
        println(f"hllsweep $d epochs=$rows wall(min2)=$t%.2f s")
      case "psisweep" =>
        // e17 drift gate at corpus scale: one corpus exchange into
        // per-epoch histograms; grid/fold is histogram-sized.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val ev = Tables.events(spark, d).select(
          dayofmonth(col("ts")).cast("long").as("batch"),
          (col("user_id") % 10).cast("int").as("bucket"))
        var rows = 0L
        val t = (1 to 2).map(_ => time {
          rows = graft.streaming.DriftStream.psiGateBatch(
            ev, "bucket", "batch", 10, 0.05).count()
        }).min
        println(f"psisweep $d epochs=$rows wall(min2)=$t%.2f s")
      case "g6sweep" =>
        // k-core peeling at corpus scale: per-round cost tracks the
        // SHRINKING subgraph, rounds stay a handful.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val kk = if (args.length > 2) args(2).toInt else 4
        val li = Tables.lineitem(spark, d)
          .filter(col("l_orderkey") % 80 === 0)
          .select(col("l_orderkey"), col("l_partkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("p1"),
            col("b.l_partkey").as("p2"))
          .distinct()
        var core = 0L
        val t = time {
          core = graft.operators.Graph
            .kCore(e, "p1", "p2", kk, peels = 12).count()
        }
        println(f"g6sweep $d k=$kk core=$core wall=$t%.2f s")
      case "g5sweep" =>
        // connected components on the sf1 part co-occurrence graph:
        // wall + structure (components, giant size) + pointer-doubling
        // round economics at a corpus-scale graph.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val mod = if (args.length > 2) args(2).toInt else 80
        val li = Tables.lineitem(spark, d)
          .filter(col("l_orderkey") % mod === 0)
          .select(col("l_orderkey"), col("l_partkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("p1"),
            col("b.l_partkey").as("p2"))
          .distinct()
        val nE = e.count()
        var nc = 0L; var giant = 0L; var nodes = 0L
        val t = time {
          val sizes = graft.operators.Graph
            .connectedComponents(e, "p1", "p2")
            .groupBy(col("component")).agg(count(lit(1)).as("n"))
          val agg = sizes.agg(count(lit(1)), max(col("n")),
            sum(col("n"))).head()
          nc = agg.getLong(0); giant = agg.getLong(1)
          nodes = agg.getLong(2)
        }
        println(f"g5sweep $d mod=$mod edges=$nE nodes=$nodes " +
          f"components=$nc giant=$giant wall=$t%.2f s")
      case "wpsweep" =>
        // WordPiece at corpus scale: trainer rounds are V-bounded
        // (corpus touched once), encode is occurrence-local — time
        // both halves separately.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val merges = if (args.length > 2) args(2).toInt else 8
        val docs = Tables.documents(spark, d)
        var mergedPieces: Seq[String] = Seq.empty
        val tTrain = time {
          mergedPieces = graft.operators.Bpe
            .wordpieceMerges(docs, "text", merges)
            .orderBy(col("rank")).collect().map(_.getString(3)).toSeq
        }
        val vocab = graft.operators.Bpe.wordpieceVocab(docs, "text",
          mergedPieces)
        var toks = 0L
        val tEnc = (1 to 2).map(_ => time {
          toks = graft.operators.Bpe.wordpieceEncode(
              docs.select("doc_id", "text"), "text", vocab)
            .agg(sum(size(col("tokens")))).head().getLong(0)
        }).min
        println(f"wpsweep $d merges=$merges vocab=${vocab.size} " +
          f"tokens=$toks train=$tTrain%.2f s encode(min2)=$tEnc%.2f s")
      case other =>
        System.err.println(s"unknown scratch target '$other'")
        sys.exit(2)
    }
    spark.stop()
  }
}
