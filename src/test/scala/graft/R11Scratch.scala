package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Curation, RangeJoin}
import graft.util.Tables

/** Round-11 bench measurements (test scope, not shipped) — the three
  * rows VERDICT r10 items 3/4 ask for:
  *
  *  - `t9`: build-vs-query split for the materialized BM25 inverted
  *    index. The committed battery prices t9 at index-BUILD cost
  *    (the oracle row rebuilds the posting table each run to stay
  *    self-contained); this records the amortized bucket-pruned QUERY
  *    against a pre-built index — the write-once/query-many number.
  *  - `j14`: bucketed-join write-vs-read split at scale (the battery
  *    row likewise pays both bucketed WRITES inside the timed region).
  *  - `j15`: bucketized range join at sf10, with the join-output row
  *    count recorded so cost can be normalized by output growth
  *    (output grows ~|lineitem|x|part| density, i.e. ~100x per 10x
  *    input on this corpus).
  *
  * Run with `sbt "Test/runMain graft.R11Scratch <t9|j14|j15> [sfDir]"`.
  * Corpora above sf0.1 come from [[graft.ScaleUp]] (bench-only;
  * correctness stays gated on the driver's sf0.01 parquet).
  */
object R11Scratch {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "t9"
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
      case "t9" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}") // warmup scan
        // build twice, report min (first pass absorbs JIT/codegen)
        val build = minOf(2)(Curation.buildBm25Index(
          docs, "doc_id", "text", "r11_bm25_idx", nBuckets = 16))
        def query(): Unit = Curation.bm25TopKIndexed(spark, "r11_bm25_idx",
          terms = Seq("spark", "vector", "hash", "quantile"), topN = 10,
          scoreScale = 12).count()
        query() // warmup the query plan once
        val q = minOf(5)(query())
        println(f"T9 $d build=$build%.2f s  query(min of 5)=$q%.3f s  " +
          f"ratio=${build / q}%.0fx")

      case "j14" =>
        val orders = Tables.orders(spark, d)
        val lineitem = Tables.lineitem(spark, d)
        println(s"CORPUS $d orders=${orders.count()} lineitem=${lineitem.count()}")
        val (_, wO) = time(Bucketing.writeBucketed(
          orders, "r11_orders_b", "o_orderkey", nBuckets = 8))
        val (_, wL) = time(Bucketing.writeBucketed(
          lineitem, "r11_lineitem_b", "l_orderkey", nBuckets = 8))
        def read(): Unit = Bucketing.bucketedJoin(spark,
          "r11_lineitem_b", "r11_orders_b", "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")))
          .count()
        read() // warmup
        val r = minOf(2)(read())
        println(f"J14 $d write_orders=$wO%.2f s write_lineitem=$wL%.2f s " +
          f"read_join(min of 2)=$r%.2f s")

      case "j15" =>
        val l = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        val p = Tables.part(spark, d).select(col("p_partkey"),
          (col("p_retailprice") * 0.99).as("lo"),
          (col("p_retailprice") * 1.01).as("hi"))
        println(s"CORPUS $d lineitem=${l.count()} part=${p.count()}")
        def run(): (Long, Long) = {
          val agg = RangeJoin.bucketized(l, "l_extendedprice", p, "lo", "hi",
              width = 20.0)
            .groupBy(col("p_partkey"))
            .agg(count(lit(1)).as("n_lines"))
            .agg(count(lit(1)).as("groups"), sum(col("n_lines")).as("out_rows"))
            .collect()(0)
          (agg.getLong(0), agg.getLong(1))
        }
        val ((groups, outRows), t1) = time(run())
        val (_, t2) = time(run())
        println(f"J15 $d wall(min of 2)=${math.min(t1, t2)}%.2f s " +
          s"groups=$groups join_out_rows=$outRows")

      case "curation" =>
        // round-11 ops (x7/x8/x9/t10) at scale: all documents-backed
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("x7_quota_cap")(Curation.quotaCap(docs, "doc_id", "source",
          graft.functions.TextAnalysis.qualityScore(col("text")), 20).count())
        m("x8_pii_redact")(Curation.redactPii(docs, "text")
          .agg(sum(col("n_email") + col("n_url") + col("n_ipv4")))
          .collect().length.toLong)
        m("x9_boilerplate")(Curation.boilerplateLines(docs, "doc_id",
          "text", 8, 2).count())
        m("t10_token_entropy")(Curation.tokenEntropy(docs, "doc_id",
          "text").count())

      case "r11b" =>
        // second round-11 batch (t11/x10/d12) at scale
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("t11_readability")(docs.select(
          graft.functions.TextAnalysis.fleschScore(col("text")).as("f"))
          .agg(sum(col("f"))).collect().length.toLong)
        m("x10_ngram_repetition")(Curation.ngramRepetitionStats(
          docs, "doc_id", "text").count())
        m("d12_winnow_fp")(graft.operators.Dedup.winnowedFingerprints(
          docs, "doc_id", "text").count())
        m("d12_winnow_pairs")(graft.operators.Dedup.winnowedDupPairs(
          docs, "doc_id", "text").count())

      case "d12prof" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        val fps = graft.operators.Dedup.winnowedFingerprints(
          docs, "doc_id", "text")
        val hist = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
          .groupBy(col("n")).agg(count(lit(1)).as("buckets"))
          .orderBy(col("n").desc).limit(30).collect()
        println("top bucket sizes (n -> buckets): " +
          hist.map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(" "))
        val est = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1 && col("n") <= 1024)
          .agg(sum(col("n") * (col("n") - 1)).cast("long"))
          .collect()(0).getLong(0) / 2
        println(s"expanded pair structs (<=1024 buckets): $est")
        (1 to 3).foreach { t =>
          val (n, w) = time(graft.operators.Dedup.winnowedDupPairs(
            docs, "doc_id", "text").count())
          println(f"trial $t: pairs=$n wall=$w%.2f s")
        }

      case "x7prof" =>
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        import graft.functions.TextAnalysis
        def t(name: String, c: org.apache.spark.sql.Column): Unit = {
          val w = minOf(2)(docs.select(c.cast("double").as("s"))
            .agg(sum(col("s"))).collect())
          println(f"X7PROF $name $w%.2f s")
        }
        t("baseline_len", length(col("text")))
        t("token_count", TextAnalysis.tokenCount(col("text")))
        t("punct_count", TextAnalysis.punctCount(col("text")))
        t("stopword_set", TextAnalysis.wordSetOccurrences(col("text"),
          TextAnalysis.LangStopwords.flatMap(_._2)))
        t("quality_full", TextAnalysis.qualityScore(col("text")))
        t("regex_token_count", TextAnalysis.regexTokenCount(col("text")))
        t("fingerprint", length(TextAnalysis.fingerprint(col("text"))))
        val tWin = minOf(2)(Curation.quotaCap(docs, "doc_id", "source",
          (col("doc_id") % 1000).cast("double"), 20).count())
        println(f"X7PROF window_only $tWin%.2f s")

      case "regexprof" =>
        // single-thread JVM regex cost on the real corpus texts
        val texts = Tables.documents(spark, d).select(col("text"))
          .limit(20000).collect().map(_.getString(0))
        println(s"n=${texts.length} avg_len=${texts.map(_.length).sum / texts.length}")
        for (pat <- Seq("[^a-zA-Z0-9\\s]", "[^a-zA-Z0-9 ]", "\\p{Punct}",
            "\\b(the|and|of|der|die|und|el|los|que|le|la|et)\\b")) {
          val p = java.util.regex.Pattern.compile(pat)
          val t0 = System.nanoTime()
          var n = 0L
          texts.foreach { s =>
            val m = p.matcher(s)
            while (m.find()) n += 1
          }
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"REGEXPROF '$pat' $dt%.3f s matches=$n (${dt / texts.length * 1e6}%.1f us/doc)")
        }

      case "r11c" =>
        // third round-11 batch (t12/d15/x12/m8) at scale
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        m("t12_charlm")(Curation.charLmScore(docs, "doc_id", "text")
          .count())
        // d15: centroid count grows with the corpus (k ~ n/100, the
        // SemDeDup sizing the operator doc prescribes) so cells stay
        // ~100 members and the intra-cell quadratic stays bounded
        val e = Tables.embeddings(spark, d)
        val n = e.count()
        val k = math.max(16, (n / 100).toInt)
        val centroids = e
          .select(col("vec_id").cast("long").as("id"),
            col("embedding").as("v"))
          .orderBy(col("id")).limit(k)
          .collect().map(_.getSeq[Float](1).toArray)
        println(s"d15 n=$n k=$k")
        m("d15_semdedup")(graft.operators.Dedup.semDedup(
          e, "vec_id", "embedding", centroids, 0.35)
          .filter(!col("keep")).count())
        m("x12_leak_split")(Curation.leakSafeSplit(docs, "doc_id",
          graft.operators.Dedup.dupClusters(
            graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id",
              "text", k = 3, threshold = 0.7), "id_a", "id_b"))
          .count())
        val variants = graft.operators.Multimodal
          .syntheticVariantImages(spark, d)
        m("m8_phash_hash")(graft.operators.Multimodal
          .imagePhash(variants).count())
        m("m8_phash_pairs")(graft.operators.Dedup.fingerprintNearDupPairs(
          graft.operators.Multimodal.imagePhash(variants),
          "media_id", "phash", bands = 4, maxHamming = 16).count())

      case "r11d" =>
        // fourth round-11 batch (m9/d16) at scale
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        val wavs = graft.operators.Multimodal.syntheticVariantWavs(spark, d)
        m("m9_audio_hash")(graft.operators.Multimodal
          .audioFingerprint(wavs).count())
        m("m9_audio_pairs")(graft.operators.Dedup.fingerprintNearDupPairs(
          graft.operators.Multimodal.audioFingerprint(wavs),
          "media_id", "afp", bands = 4, maxHamming = 16).count())
        val e = Tables.embeddings(spark, d)
        val n = e.count()
        val k = math.max(16, (n / 100).toInt)
        val centroids = e
          .select(col("vec_id").cast("long").as("id"),
            col("embedding").as("v"))
          .orderBy(col("id")).limit(k)
          .collect().map(_.getSeq[Float](1).toArray)
        println(s"d16 n=$n k=$k")
        m("d16_incremental_semdedup")(graft.operators.Dedup
          .incrementalSemDedup(
            e.filter(col("vec_id") % 5 === 0),
            e.filter(col("vec_id") % 5 =!= 0),
            "vec_id", "embedding", centroids, 0.35).count())

      case "r11e" =>
        // final round-11 batch (x13/x14/m10/sk3/l3/l4) at scale
        val docs = Tables.documents(spark, d)
        println(s"CORPUS $d n_docs=${docs.count()}")
        def m(name: String)(body: => Long): Unit = {
          var rows = 0L
          val t = minOf(2) { rows = body }
          println(f"$name $d wall(min of 2)=$t%.2f s rows=$rows")
        }
        val tarDir = java.nio.file.Files.createTempDirectory("r11e-tar")
          .toString
        m("x13_tar_write") {
          graft.sources.TarShards.write(
            docs.selectExpr("cast(doc_id as string) as name",
              "encode(text, 'UTF-8') as payload"),
            "name", "payload", tarDir, nShards = 32)
          32L
        }
        m("x13_tar_read")(graft.sources.TarShards.read(spark, tarDir)
          .count())
        m("x14_mixture_sample")(Curation.mixtureSample(docs, "doc_id",
          "source", "text").count())
        m("m10_scene_cuts")(graft.SparkEntry.queries("m10_scene_cuts")(
          spark, d).count())
        val ev = Tables.events(spark, d)
        m("sk3_kmv_build")(graft.operators.Sketches.kmvByKey(
          ev, "event_type", "user_id", 256).count())
        val cust = Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val batch = cust.filter(col("c_custkey") % 7 === 0)
        m("l3_upsert")(graft.operators.Layout.upsert(cust, batch,
          Seq("c_custkey")).count())
        m("l4_snapshot_diff")(graft.operators.Layout.snapshotDiff(
          cust, cust.filter(col("c_custkey") % 11 =!= 0),
          Seq("c_custkey")).count())

      case "d17" =>
        val e = Tables.embeddings(spark, d)
        val n = e.count()
        val tau = sys.env.getOrElse("SPARK_GRAFT_TAU", "0.35").toDouble
        val (bands, bits) = graft.operators.Similarity
          .rhpGeometry(n, threshold = tau)
        println(s"CORPUS $d n=$n tau=$tau geometry=${bands}x$bits")
        val lake = e.filter(col("vec_id") % 5 =!= 0)
        val batch = e.filter(col("vec_id") % 5 === 0)
        val (_, tw) = {
          val t0 = System.nanoTime()
          graft.operators.Similarity.writeRhpIndex(lake, "vec_id",
            "embedding", "d17_sweep_idx", bands, bits)
          ((), (System.nanoTime() - t0) / 1e9)
        }
        var rows = 0L
        val tq = minOf(2) {
          rows = graft.operators.Similarity.incrementalEmbedNewIndexed(
            spark, "d17_sweep_idx", batch, "vec_id", "embedding",
            threshold = tau, bands, bits).count()
        }
        println(f"d17 $d write=$tw%.2f s query(min of 2)=$tq%.2f s " +
          s"survivors=$rows")

      case "g1" =>
        val orders = Tables.orders(spark, d)
        val lineitem = Tables.lineitem(spark, d)
        println(s"CORPUS $d orders=${orders.count()} " +
          s"lineitem=${lineitem.count()}")
        val edges = orders.select(col("o_orderkey"), col("o_custkey"))
          .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        var rows = 0L
        val t = minOf(2) {
          rows = graft.operators.Graph.pageRank(edges, "src", "dst", 5)
            .count()
        }
        println(f"g1_pagerank $d wall(min of 2)=$t%.2f s nodes=$rows")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
