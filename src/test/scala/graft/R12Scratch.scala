package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Round-12 bench measurements (test scope, not shipped) — the d17
  * re-measure the round-11 verdict asked for: the indexed embedding
  * near-dup path with (a) exact-dedup-first preprocessing (the
  * prescribed pipeline ordering), (b) the count-first bucket cap, and
  * (c) an optional injected duplicate mass reproducing the lake shape
  * that previously overflowed spill disk, now bounded by the cap.
  *
  * Run: `sbt "Test/runMain graft.R12Scratch d17 [sfDir]"`.
  * Env knobs: SPARK_GRAFT_TAU (threshold, default 0.35),
  * SPARK_GRAFT_MAXBUCKET (cap, default 4096), SPARK_GRAFT_DUPMASS
  * (replication factor for a 0.1% duplicate-mass slice, default 0 =
  * no injection; e.g. 200 gives the previously-failing shape).
  */
object R12Scratch {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "d17"
    val d = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def minOf(n: Int)(body: => Unit): Double =
      (1 to n).map(_ => time(body)._2).min

    mode match {
      case "d17" =>
        val tau = sys.env.getOrElse("SPARK_GRAFT_TAU", "0.35").toDouble
        val maxBucket =
          sys.env.getOrElse("SPARK_GRAFT_MAXBUCKET", "4096").toInt
        val dupMass = sys.env.getOrElse("SPARK_GRAFT_DUPMASS", "0").toInt
        val raw0 = Tables.embeddings(spark, d)
        // optional duplicate-mass injection: replicate a 0.1% slice
        // dupMass times with fresh ids — the exact-dedup-skipping lake
        // shape whose every-band collisions previously overflowed
        // spill disk on the uncapped probe
        val raw =
          if (dupMass == 0) raw0
          else raw0.unionByName(
            raw0.filter(col("vec_id") % 1000 === 0)
              .crossJoin(spark.range(1, dupMass.toLong + 1).toDF("c"))
              // multiplier coprime to the %5 lake/batch split so the
              // duplicate mass lands on BOTH sides
              .select((col("vec_id") + col("c") * 100000001L).as("vec_id"),
                col("embedding"), col("label")))
        val nRaw = raw.count()
        val skipDedup = sys.env.get("SPARK_GRAFT_SKIPDEDUP").contains("1")
        // exact-dedup-first: the standing contract of every banding
        // family — identical vectors keep one representative
        // (SKIPDEDUP=1 measures the contract-violating lake the
        // bucket cap exists for)
        val e = (if (skipDedup) raw
          else raw.groupBy(col("embedding"))
            .agg(min(col("vec_id")).as("vec_id"),
              first(col("label")).as("label"))
            .select(col("vec_id"), col("embedding"), col("label")))
          .localCheckpoint()
        val n = e.count()
        val (bands, bits) = graft.operators.Similarity
          .rhpGeometry(n, threshold = tau)
        println(s"CORPUS $d raw=$nRaw deduped=$n tau=$tau " +
          s"maxBucket=$maxBucket dupMass=$dupMass geometry=${bands}x$bits")
        val lake = e.filter(col("vec_id") % 5 =!= 0)
        val batch = e.filter(col("vec_id") % 5 === 0)
        val (_, tw) = time {
          graft.operators.Similarity.writeRhpIndex(lake, "vec_id",
            "embedding", "d17_r12_idx", bands, bits)
        }
        val stats = graft.operators.Similarity
          .rhpBucketStats(spark, "d17_r12_idx", maxBucket).collect()(0)
        println(s"STATS $stats")
        var rows = 0L
        val tq = minOf(2) {
          rows = graft.operators.Similarity.incrementalEmbedNewIndexed(
            spark, "d17_r12_idx", batch, "vec_id", "embedding",
            threshold = tau, bands, bits, maxBucket = maxBucket).count()
        }
        println(f"d17 $d write=$tw%.2f s query(min of 2)=$tq%.2f s " +
          s"survivors=$rows")

      case "r12" =>
        // decade rows for the round-12 operators
        import graft.operators.{Curation, Dedup, Graph}
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("c1_pipeline") {
          val f = graft.cli.CurateCli.pipeline(spark, docs,
            Some(docs.filter(col("doc_id") % 10 === 0)), 20, 2)
          f.curated.count() + f.dropped.count()
        }
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        val eval = docs.filter(col("doc_id") % 10 === 0)
        val (b18, r18) = Dedup.minhashGeometry(train.count(), 0.8)
        m("d18_fuzzy_decon")(Curation.fuzzyDecontaminate(train, eval,
          "doc_id", "text", numHashes = b18 * r18, bands = b18).count())
        m("c2_dataset_card")(Curation.datasetCard(docs, "source",
          "text", "lang").count())
        val edges = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        m("g2_pagerank_redist")(Graph.pageRank(edges, "src", "dst", 5,
          redistributeDangling = true).count())
        m("curate_gate_batch") {
          graft.streaming.IngestGate.curateGate(eval,
            Dedup.winnowedFingerprints(train, "doc_id", "text"),
            "text").count()
        }
        m("t12_charlm_full")(Curation.charLmScore(docs, "doc_id",
          "text").count())

      case "r12b" =>
        // decade rows for the second round-12 operator batch
        import graft.operators.{Bpe, Curation, LogReg}
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("b1_bpe_merges_train")(
          Bpe.bpeMerges(docs, "text", 4).count())
        val merges = Bpe.bpeMerges(docs, "text", 4)
          .orderBy("rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        m("b2_bpe_encode") {
          // agg over the outputs so column pruning cannot skip the
          // encode fold or the md5
          Bpe.bpeEncode(docs.select("doc_id", "text"), "text", merges)
            .select(col("doc_id"),
              size(col("tokens")).cast("bigint").as("n_tokens"),
              md5(array_join(col("tokens"), " ")).as("tok_md5"))
            .agg(sum(col("n_tokens")) +
              sum(length(col("tok_md5")).cast("bigint")))
            .first().getLong(0)
        }
        m("x15_chunk_offsets") {
          val counted = docs.select(col("doc_id"),
            size(filter(split(trim(col("text")), "\\s+"),
              w => w =!= "")).cast("bigint").as("n_tok"))
          Curation.concatChunkOffsets(counted, "doc_id", "n_tok",
              expr("doc_id div 50"), seqLen = 512)
            .agg(sum(col("chunk_last") - col("chunk_first")) +
              max(col("offset")))
            .first().getLong(0)
        }
        m("lr1_quality_lr") {
          val toks = filter(split(trim(col("text")), "\\s+"),
            w => w =!= "")
          val feats = docs.select(col("doc_id"),
              size(toks).cast("double").as("nw"),
              col("n_chars").cast("double").as("nc"),
              size(array_distinct(toks)).cast("double").as("nd"))
            .filter(col("nw") > 0)
            .select(col("doc_id"),
              (col("nw") / lit(100.0)).as("f1"),
              (col("nc") / col("nw") / lit(10.0)).as("f2"),
              (col("nd") / col("nw")).as("f3"),
              when(col("nw") >= 30 && col("nw") <= 5000 &&
                  col("nd") / col("nw") >= 0.3, 1.0)
                .otherwise(0.0).as("y"))
          val fs = Seq("f1", "f2", "f3")
          val w = LogReg.train(feats, "y", fs)
          feats.agg(sum(LogReg.score(w, fs) * lit(1000.0))
            .cast("bigint")).first().getLong(0)
        }

      case "r12c" =>
        // decade rows for the third round-12 operator batch
        import graft.operators.{Bpe, Curation, Sketches, Similarity}
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("s11_pca_residual") {
          Similarity.pcaResidual(Tables.embeddings(spark, d), "vec_id",
              "embedding")
            .agg(sum(col("proj")) + sum(col("rnorm"))).first()
          Tables.embeddings(spark, d).count()
        }
        m("sk4_mg") {
          val toks = docs.select(explode(
            split(trim(col("text")), "\\s+")).as("tok"))
          Sketches.heavyHitterSummary(toks, "tok", 8).length.toLong
        }
        m("sk5_quantiles") {
          val counts = docs.select(
            size(split(trim(col("text")), "\\s+")).cast("long").as("v"))
          counts.agg(percentile_approx(col("v"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)))
            .first().getSeq[Long](0).sum
        }
        m("x16_drift_psi") {
          val b = docs.select(col("doc_id"),
            least(expr(
              "size(split(trim(text), '\\\\s+')) div 100"),
              lit(9)).cast("int").as("bucket"))
          Curation.driftPsi(b.filter(col("doc_id") % 2 === 0),
              b.filter(col("doc_id") % 2 === 1), "bucket", 10)
            .agg(sum(col("psi") * lit(1e9)).cast("bigint"))
            .first().getLong(0)
        }
        m("b3_token_freq") {
          val merges = Bpe.bpeMerges(docs, "text", 4)
            .orderBy("rank").collect()
            .map(r => (r.getString(1), r.getString(2))).toSeq
          Bpe.tokenFrequencies(docs, "text", merges)
            .agg(sum(col("n"))).first().getLong(0)
        }
        m("ds1_dsir_score") {
          Curation.dsirScores(docs.filter(col("doc_id") % 7 =!= 0),
              docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
            .agg(sum(col("logw") * lit(1e6)).cast("bigint"))
            .first().getLong(0)
        }
        m("ds2_dsir_resample") {
          Curation.dsirResample(docs.filter(col("doc_id") % 7 =!= 0),
              docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
            .filter(col("keep")).count()
        }
        m("b4_fertility") {
          val merges = Bpe.bpeMerges(docs, "text", 4)
            .orderBy("rank").collect()
            .map(r => (r.getString(1), r.getString(2))).toSeq
          Bpe.fertilityBy(docs, "text", "lang", merges)
            .agg(sum(col("n_tokens"))).first().getLong(0)
        }

      case "s10" =>
        val e = Tables.embeddings(spark, d)
        println(s"CORPUS $d n=${e.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.Similarity
            .pcaProject(e, "vec_id", "embedding").count()
        }
        println(f"s10 $d wall(min of 2)=$t%.2f s rows=$rows")

      case "b1" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.Bpe.bpeMerges(docs, "text", 16).count()
        }
        println(f"b1 $d wall(min of 2)=$t%.2f s merges=$rows")

      case "x17" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.Curation
            .dupNgramFraction(docs, "doc_id", "text")
            .agg(sum(col("dup_frac_e6"))).first().getLong(0)
        }
        println(f"x17 $d wall(min of 2)=$t%.2f s sum_frac_e6=$rows")

      case "x18" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        var kept = 0L
        val t = minOf(2) {
          kept = graft.operators.Curation
            .stripDupSpans(docs, "doc_id", "text")
            .agg(sum(col("kept_tokens")), sum(length(col("clean_text"))))
            .first().getLong(0)
        }
        println(f"x18 $d wall(min of 2)=$t%.2f s kept_tokens=$kept")

      case "w10" =>
        val ev = Tables.events(spark, d)
        println(s"CORPUS $d n_events=${ev.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.EventOps.resampleFill(ev).count()
        }
        println(f"w10 $d wall(min of 2)=$t%.2f s grid_rows=$rows")

      case "a13" =>
        val ev = Tables.events(spark, d)
        println(s"CORPUS $d n_events=${ev.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.SparkEntry.queries("a13_robust_outliers")(spark, d)
            .count()
        }
        println(f"a13 $d wall(min of 2)=$t%.2f s rows=$rows")

      case "w11" =>
        val ev = Tables.events(spark, d)
        println(s"CORPUS $d n_events=${ev.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.EventOps.resampleInterp(ev).count()
        }
        println(f"w11 $d wall(min of 2)=$t%.2f s grid_rows=$rows")

      case "d19" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.Dedup
            .containmentPairs(docs, "doc_id", "text").count()
        }
        println(f"d19 $d wall(min of 2)=$t%.2f s pairs=$rows")

      case "d19prof" =>
        // where do d19's sf10 seconds go? time the candidate stage
        // alone (prefix ⋈ capped postings ⋈ distinct) vs the full op
        import graft.operators.Dedup
        val docs = Tables.documents(spark, d)
        val sets = docs
          .select(col("doc_id").as("id"), col("text"))
          .withColumn("shs", array_distinct(expr("word_shingles(text, 3)")))
          .withColumn("hs",
            array_sort(array_distinct(Dedup.baseHashes(col("shs")))))
          .select(col("id"), col("hs"))
        graft.functions.ShinglesImpl.register(spark)
        val prefixLen = greatest(size(col("hs")) -
          ceil(lit(0.8) * size(col("hs"))).cast("int") + 1, lit(1))
        val prefix = sets.select(col("id").as("id_a"),
          explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
        val postings = sets.select(col("id").as("id_b"),
          explode(col("hs")).as("h"))
        val active = postings.groupBy(col("h"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") <= 1024).select(col("h"))
        var nc = 0L
        val tc = minOf(2) {
          nc = prefix.join(postings.join(active, "h"), "h")
            .filter(col("id_a") =!= col("id_b"))
            .select(col("id_a"), col("id_b")).distinct().count()
        }
        var nraw = 0L
        val traw = minOf(2) {
          nraw = prefix.join(postings.join(active, "h"), "h")
            .filter(col("id_a") =!= col("id_b")).count()
        }
        println(f"d19prof $d cand_distinct=$nc ($tc%.2f s) " +
          f"cand_raw=$nraw ($traw%.2f s)")

      case "t12prof" =>
        // Is t12 explode-bound? Time the halves: (scan) raw text scan,
        // (model) explode → partial agg → V-row shuffle, (full) both
        // explodes + broadcast join + doc agg. If model ≈ half of
        // full and both dwarf the scan, the 2×chars explode (not the
        // join/agg) is the cost driver and the packed-counts
        // expression pays.
        import graft.operators.Curation
        val docs = Tables.documents(spark, d).localCheckpoint()
        val nd = docs.count()
        val (chars, tScan) = {
          val t0 = System.nanoTime()
          val c = docs.agg(sum(length(col("text")))).first().getLong(0)
          (c, (System.nanoTime() - t0) / 1e9)
        }
        println(f"CORPUS $d docs=$nd chars=$chars scan=$tScan%.2f s")
        val tModel = minOf(2) {
          docs.select(explode(Curation.charBigrams(col("text")))
              .as("gram"))
            .groupBy(col("gram")).agg(count(lit(1)))
            .agg(count(lit(1))).first()
        }
        var rows = 0L
        val tFull = minOf(2) {
          rows = Curation.charLmScore(docs, "doc_id", "text").count()
        }
        println(f"t12prof $d model=$tModel%.2f s full=$tFull%.2f s " +
          f"docs_scored=$rows (model/full=${tModel / tFull}%.2f)")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
