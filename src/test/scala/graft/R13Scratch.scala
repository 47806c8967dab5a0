package graft

import org.apache.spark.sql.functions._

/** Round-13 measurement harness (dev-only; excluded from LoC, like
  * R11/R12Scratch). Run pieces via
  * `sbt 'Test/runMain graft.R13Scratch <what> <args...>'`. */
object R13Scratch {
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
    args.headOption.getOrElse("") match {
      case "prplan" =>
        import spark.implicits._
        import graft.operators.Graph
        val e = (0L until 10000L).map(i => (i % 997, (i * 31) % 997))
          .toDF("src", "dst")
        val ctx = Graph.prepare(e, "src", "dst")
        val r0 = graft.util.Iter.materialize(
          ctx.nodes.select(col("node"), lit(1.0 / ctx.n).as("rank")))
        val r1 = Graph.round(ctx, r0, 0.85, false)
        // the plan of a STEADY-STATE round (round 2+): lazy form
        val inbound = ctx.contrib
          .join(r1, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(col("rank") / col("deg")).as("inb"))
        val lazyRound = ctx.nodes
          .join(inbound, col("node") === col("dst"), "left")
          .select(col("node"), (lit(0.15 / ctx.n) + lit(0.85) *
            coalesce(col("inb"), lit(0.0))).as("rank"))
        lazyRound.collect()
        println("=== steady-state round executedPlan ===")
        println(lazyRound.queryExecution.executedPlan.toString)
      case "prpart" =>
        import spark.implicits._
        import graft.operators.Graph
        val e = (0L until 10000L).map(i => (i % 997, (i * 31) % 997))
          .toDF("src", "dst")
        val ctx = Graph.prepare(e, "src", "dst")
        def part(df: org.apache.spark.sql.DataFrame, name: String): Unit =
          df.queryExecution.optimizedPlan.collectLeaves().foreach {
            case l: org.apache.spark.sql.execution.LogicalRDD =>
              println(s"$name partitioning=${l.outputPartitioning} " +
                s"ordering=${l.outputOrdering.mkString(",")}")
            case o => println(s"$name leaf=${o.getClass.getSimpleName}")
          }
        part(ctx.contrib, "contrib")
        part(ctx.nodes, "nodes")
      case "g1" =>
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf10"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val edges = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        var rows = 0L
        val t1 = (1 to 2).map(_ => time {
          rows = graft.operators.Graph.pageRank(edges, "src", "dst", 5)
            .count()
        }).min
        println(f"g1_pagerank $d wall(min of 2)=$t1%.2f s nodes=$rows")
        val t2 = (1 to 2).map(_ => time {
          rows = graft.operators.Graph.pageRank(edges, "src", "dst", 5,
            redistributeDangling = true).count()
        }).min
        println(f"g2_pagerank_redist $d wall(min of 2)=$t2%.2f s nodes=$rows")
      case "g1old" =>
        // round-12 shape: plain (unclustered) checkpoints — the
        // before side of the round-13 clustered-edge measurement
        import graft.util.{Iter, Tables}
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf10"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val edges = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        def run(redistribute: Boolean): Long = {
          val e = edges.select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"))
          val nodes = Iter.materialize(
            e.select(col("src").as("node"))
              .union(e.select(col("dst").as("node"))).distinct())
          val n = nodes.count()
          val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          val contrib = Iter.materialize(e.join(deg, "src"))
          val dangling = Iter.materialize(
            nodes.join(e.select(col("src").as("node")).distinct(),
              Seq("node"), "left_anti"))
          val ctx = graft.operators.Graph.Ctx(nodes, n, contrib, Some(dangling))
          var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
          for (_ <- 1 to 5)
            ranks = graft.operators.Graph.round(ctx, ranks, 0.85,
              redistribute)
          val c = ranks.count()
          ctx.release()
          c
        }
        var rows = 0L
        val t1 = (1 to 2).map(_ => time { rows = run(false) }).min
        println(f"g1_pagerank_OLD $d wall(min of 2)=$t1%.2f s nodes=$rows")
        val t2 = (1 to 2).map(_ => time { rows = run(true) }).min
        println(f"g2_pagerank_OLD $d wall(min of 2)=$t2%.2f s nodes=$rows")
      case "g2ab" =>
        // interleaved A/B: OLD (plain checkpoints) vs NEW (clustered)
        // on the redistributing variant, every rep printed
        import graft.util.{Iter, Tables}
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf10"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val edges = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        def runOld(): Long = {
          val e = edges.select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"))
          val nodes = Iter.materialize(
            e.select(col("src").as("node"))
              .union(e.select(col("dst").as("node"))).distinct())
          val n = nodes.count()
          val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          val contrib = Iter.materialize(e.join(deg, "src"))
          val dangling = Iter.materialize(
            nodes.join(e.select(col("src").as("node")).distinct(),
              Seq("node"), "left_anti"))
          val ctx = graft.operators.Graph.Ctx(nodes, n, contrib, Some(dangling))
          var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
          for (_ <- 1 to 5)
            ranks = graft.operators.Graph.round(ctx, ranks, 0.85, true)
          val c = ranks.count(); ctx.release(); c
        }
        // warm the page cache once
        edges.count()
        for (rep <- 1 to 3) {
          val tn = time { graft.operators.Graph.pageRank(edges, "src",
            "dst", 5, redistributeDangling = true).count() }
          val to = time { runOld() }
          println(f"g2ab rep=$rep NEW=$tn%.2f s OLD=$to%.2f s")
        }
      case "g2phase" =>
        // per-phase timing: prepare vs each round, OLD vs NEW layout
        import graft.util.{Iter, Tables}
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf10"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val edges = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        edges.count() // warm cache
        def phases(clustered: Boolean): Unit = {
          val e = edges.select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"))
          var ctx: graft.operators.Graph.Ctx = null
          val tp = time {
            ctx =
              if (clustered) graft.operators.Graph.prepare(e, "src", "dst")
              else {
                val nodes = Iter.materialize(
                  e.select(col("src").as("node"))
                    .union(e.select(col("dst").as("node"))).distinct())
                val n = nodes.count()
                val deg = e.groupBy(col("src"))
                  .agg(count(lit(1)).as("deg"))
                val contrib = Iter.materialize(e.join(deg, "src"))
                val dangling = Iter.materialize(
                  nodes.join(e.select(col("src").as("node")).distinct(),
                    Seq("node"), "left_anti"))
                graft.operators.Graph.Ctx(nodes, n, contrib, Some(dangling))
              }
          }
          var ranks = ctx.nodes.select(col("node"),
            lit(1.0 / ctx.n).as("rank"))
          val nRounds =
            if (args.length > 2) args(2).toInt else 5
          val rts = (1 to nRounds).map { _ =>
            time { ranks = graft.operators.Graph.round(ctx, ranks, 0.85,
              true) }
          }
          ctx.release()
          println(f"g2phase clustered=$clustered prepare=$tp%.2f s " +
            f"roundsSum=${rts.sum}%.2f s " +
            s"rounds=${rts.map(t => f"$t%.2f").mkString(",")}")
        }
        for (_ <- 1 to 2) { phases(true); phases(false) }
      case "d20" =>
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val docs = Tables.documents(spark, d)
        var rows = 0L
        val t = (1 to 2).map(_ => time {
          rows = graft.operators.Dedup.exactDupSpans(docs, "doc_id",
            "text").count()
        }).min
        println(f"d20_exact_spans $d wall(min of 2)=$t%.2f s spans=$rows")
      case "row" =>
        // decade wall for any single oracle row: R13Scratch row <name> <sfDir>
        val name = args(1)
        val d = if (args.length > 2) args(2) else "/root/repo/target/sf1"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        var rows = 0L
        val t = (1 to 2).map(_ => time {
          // checksum over every output column so Catalyst cannot
          // prune the computation under a bare count()
          val q = graft.SparkEntry.queries(name)(spark, d)
          rows = q.select(xxhash64(struct(q.columns.map(col): _*))
            .as("h")).agg(count(lit(1)), sum(col("h").cast("double")))
            .first().getLong(0)
        }).min
        println(f"rowsweep $name $d wall(min of 2)=$t%.2f s rows=$rows")
      case "unigram" =>
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val docs = Tables.documents(spark, d)
        var vocabN = 0L
        val tt = time {
          vocabN = graft.operators.Bpe.unigramTrain(docs, "text",
            vocabSize = 400, seedSize = 2000, rounds = 2).count()
        }
        val vocab = graft.operators.Bpe.unigramTrain(docs, "text",
          vocabSize = 400, seedSize = 2000, rounds = 2)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toSeq
        var toks = 0L
        val te = (1 to 2).map(_ => time {
          toks = graft.operators.Bpe.unigramEncode(docs, "text", vocab)
            .select(explode(col("pieces"))).count()
        }).min
        println(f"unigram $d train=$tt%.2f s vocab=$vocabN " +
          f"encode(min of 2)=$te%.2f s pieces=$toks")
      case "i1" =>
        val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
        val df = graft.queries.RebuildQueries.q("i1_import_pipeline")(
          spark, d)
        df.show(5, truncate = false)
        println("I1ROWS=" + df.count())
      case "d19" =>
        // adversarial quote-mass sweep for containmentPairs (the d17
        // DUPMASS convention): inject shared quotes so shingle
        // postings form (a) mass buckets far above the cap and
        // (b) dense buckets just UNDER the cap — the Σ_h n_h² pair
        // stream the cap is supposed to bound.
        import graft.util.Tables
        val d = if (args.length > 1) args(1) else "/root/repo/target/sf1"
        val shape = sys.env.getOrElse("SPARK_GRAFT_D19", "none")
        val maxPosting = sys.env.getOrElse("SPARK_GRAFT_MAXPOSTING",
          "1024").toInt
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          (System.nanoTime() - t0) / 1e9
        }
        val docs0 = Tables.documents(spark, d)
        val nDocs = docs0.count()
        val docs = shape match {
          case "none" => docs0
          case "mass" =>
            // one global quote on every 5th doc: ~n/5-deep buckets,
            // far above any cap — must be EXCLUDED with metrics, not
            // expanded
            docs0.withColumn("text",
              when(col("doc_id") % 5 === 0,
                concat(col("text"), lit(" "), expr(
                  "array_join(transform(sequence(0, 29), " +
                    "i -> concat('qmass', cast(i as string))), ' ')")))
                .otherwise(col("text")))
          case "dense" =>
            // per-group quotes sized to land each bucket JUST under
            // the default cap: group size n/groups ≈ 1000 at sf1
            // (50 groups) and sf10 (500) — the legal worst case the
            // cap admits, Σ_h n_h² pair-stream stress
            val groups = math.max(1, (nDocs / 1000).toInt)
            docs0.withColumn("text",
              concat(col("text"), lit(" "), expr(
                s"array_join(transform(sequence(0, 29), i -> " +
                  s"concat('qg', cast(doc_id % $groups as string), " +
                  s"'w', cast(i as string))), ' ')")))
          case o => sys.error(s"bad SPARK_GRAFT_D19 $o")
        }
        var rows = 0L
        val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
        val t = (1 to reps).map(_ => time {
          rows = graft.operators.Dedup.containmentPairs(docs,
            "doc_id", "text", maxPosting = maxPosting).count()
        }).min
        // posting audit recomputed exactly (the observe metric's
        // guaranteed sibling): buckets above the cap and the bounded
        // pair mass the survivors imply
        graft.functions.ShinglesImpl.register(spark)
        val p = docs.select(col("doc_id"),
            explode(array_distinct(expr("word_shingles(text, 3)")))
              .as("s"))
          .groupBy(col("s")).agg(count(lit(1)).as("n"))
          .agg(sum(when(col("n") > maxPosting, lit(1L)).otherwise(0L)),
            sum(when(col("n") > maxPosting, col("n")).otherwise(0L)),
            sum(when(col("n") <= maxPosting, col("n") * col("n"))
              .otherwise(0L)))
          .first()
        println(f"d19sweep $d shape=$shape maxPosting=$maxPosting " +
          f"wall(min of 2)=$t%.2f s pairs=$rows " +
          s"overflowBuckets=${p.getLong(0)} overflowDocs=${p.getLong(1)} " +
          s"pairStreamRows=${p.getLong(2)}")
      case other =>
        println(s"unknown: $other")
    }
    spark.stop()
  }
}
