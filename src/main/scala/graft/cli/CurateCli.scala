package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** CLI entry point for the training-data curation pipeline — the user
  * surface that ties the curation families (x/d/t oracle rows) into
  * ONE job, the way ImporterCli/RebuilderCli tie the import/rebuild
  * families into the reference's surfaces:
  *
  * {{{
  * graft.cli.CurateCli --input-dir=DIR --output-dir=DIR
  *   [--lang=fr,de]        language allowlist (t3 heuristic) as the
  *                         FIRST stage — the cheapest cut, and every
  *                         downstream signal (perplexity, classifier,
  *                         stopword quality) is language-bound; the
  *                         SAME expression tree as the streaming e13
  *                         gate, so gate ≡ batch by construction
  *   [--lang-min-hits=1]   e13's stopword confidence floor
  *   [--eval-dir=DIR]      decontaminate against this eval corpus (d8)
  *   [--min-words=20]      x11 quality-rule floor
  *   [--max-overlap=2]     drop docs sharing >= this many eval shingles
  *   [--shards=8]          packed shards per split (x2 layout)
  *   [--semantic]          d15 semantic dedup over the input dir's
  *                         embeddings sidecar (vec_id = doc_id)
  *   [--semantic-tau=0.35] cosine threshold for --semantic
  *   [--tar-shards]        also write each split as WebDataset tar
  *                         shards (x13's manifested sink)
  *   [--distill]           train the lr1 quality classifier on the
  *                         rule verdicts and write per-doc scores —
  *                         the weight vector for the next ingest
  *                         run's streaming scoreGate
  *   [--pack-budget=N]     write per-split next-fit packed payloads
  *                         (l6: strict token budget, one row per
  *                         pack) under packed/SPLIT/
  *   [--chunk-len=N]       write per-split concat-and-chunk manifests
  *                         (x15; stream order = (shard, doc_id), the
  *                         shuffled pack order trainers want)
  *   [--dsir-target=DIR]   DSIR importance resampling (ds2) against
  *                         this target corpus, between the rule
  *                         filter and dedup
  *   [--gopher]            the Gopher rule battery (x19) after the
  *                         x11 rules, failing rule = audit reason
  *   [--ppl-cut]           CCNet tail cut (t14): drop each language's
  *                         worst KN-perplexity tertile
  *   [--strip-spans[=keep-first]]  corpus-wide duplicated-span
  *                         stripping: bare, the x18 winnow rewrite
  *                         (every duplicated span leaves every doc);
  *                         =keep-first, the x24 exact rewrite (one
  *                         canonical copy survives, Raffel's
  *                         "all but one")
  *                         (x18's rewrite) over the deduped
  *                         survivors; a doc stripped to nothing is
  *                         dropped, not shipped empty
  * }}}
  *
  * Stages, each an oracle-checked operator, audited per document:
  *   1. quality filter (x11 rules, FIRST failing rule as reason);
  *   2. exact dedup (d1: lowest id per content hash survives);
  *   3. near-dup span dedup (d12 winnow pairs → d7 clusters → longest
  *      member survives, the d9 policy);
  *   4. decontamination against the eval corpus (d8) when given;
  *   5. leakage-safe split keyed on the step-3 clusters (x12 — reuses
  *      the SAME cluster frame, so near-dups that survived as distinct
  *      documents still land in one split);
  *   6. split-partitioned parquet write, shard-numbered (x2 layout:
  *      deterministic seeded hash, not rand()).
  *
  * Outputs under --output-dir:
  *   curated/  split-partitioned parquet of survivors (+shard, pos);
  *   dropped/  (doc_id, stage, reason) audit frame — at corpus scale
  *             "why was this dropped" must be answerable from output;
  *   the returned [[CurateCli.Summary]] carries per-stage counts.
  *
  * Scale shape: every stage is the documented plan of its oracle row
  * (no new shuffles are introduced by the composition — each stage's
  * survivors feed the next as a narrow id semi/anti-join), and the
  * audit frame is a union of the stages' drop sides.
  */
object CurateCli {

  case class Args(
      inputDir: String, outputDir: String,
      evalDir: Option[String] = None, minWords: Int = 20,
      maxOverlap: Int = 2, shards: Int = 8,
      semantic: Boolean = false, semanticTau: Double = 0.35,
      tarShards: Boolean = false, distill: Boolean = false,
      chunkLen: Int = 0, packBudget: Long = 0L,
      dsirTargetDir: Option[String] = None,
      stripSpans: Boolean = false, stripKeepFirst: Boolean = false,
      gopher: Boolean = false, pplCut: Boolean = false,
      langAllow: Option[Set[String]] = None, langMinHits: Int = 1)

  def parseArgs(argv: Array[String]): Args = {
    val kv = "--([a-z-]+)(?:=(.*))?".r
    val m = argv.collect { case kv(k, v) => k -> Option(v) }.toMap
    def req(k: String): String = m.getOrElse(k, None).getOrElse(
      throw new IllegalArgumentException(s"missing required --$k=..."))
    Args(
      inputDir = req("input-dir"),
      outputDir = req("output-dir"),
      evalDir = m.get("eval-dir").flatten,
      minWords = m.get("min-words").flatten.map(_.toInt).getOrElse(20),
      maxOverlap = m.get("max-overlap").flatten.map(_.toInt).getOrElse(2),
      shards = m.get("shards").flatten.map(_.toInt).getOrElse(8),
      semantic = m.contains("semantic"),
      semanticTau =
        m.get("semantic-tau").flatten.map(_.toDouble).getOrElse(0.35),
      tarShards = m.contains("tar-shards"),
      distill = m.contains("distill"),
      chunkLen = m.get("chunk-len").flatten.map(_.toInt).getOrElse(0),
      packBudget = m.get("pack-budget").flatten.map(_.toLong)
        .getOrElse(0L),
      dsirTargetDir = m.get("dsir-target").flatten,
      stripSpans = m.contains("strip-spans"),
      stripKeepFirst = m.get("strip-spans").flatten match {
        case Some("keep-first") => true
        case Some(other) => // a typo must not silently run the
          // strip-EVERY-copy rewrite on a corpus that asked for
          // keep-one-canonical
          throw new IllegalArgumentException(
            s"--strip-spans=$other: the only mode value is " +
              "'keep-first' (bare --strip-spans = winnow strip)")
        case None => false
      },
      gopher = m.contains("gopher"),
      pplCut = m.contains("ppl-cut"),
      langAllow = m.get("lang").flatten
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .map { s =>
          if (s.isEmpty) throw new IllegalArgumentException(
            "--lang= needs at least one language code")
          s
        },
      langMinHits =
        m.get("lang-min-hits").flatten.map(_.toInt).getOrElse(1))
  }

  case class Summary(
      input: Long, lowQuality: Long, exactDups: Long, nearDups: Long,
      semanticDups: Long, contaminated: Long, curated: Long,
      splits: Map[String, Long],
      distillWeights: Option[Seq[Double]] = None,
      dsirDropped: Long = 0L, strippedEmpty: Long = 0L,
      gopherDropped: Long = 0L, pplTailDropped: Long = 0L,
      langDropped: Long = 0L)

  /** The stage frames of one pipeline pass: survivors with their
    * leak-safe split, and the per-document audit rows. */
  case class Frames(curated: DataFrame, dropped: DataFrame)

  /** Stages 1–5 as pure frames (no writes) — the composition the
    * c1_curate_pipeline oracle row chains in DuckDB end to end.
    * `curated` = survivors × (split); `dropped` = (doc_id, stage,
    * reason), one row per input document across the two frames.
    *
    * `embeds` (an embeddings sidecar keyed vec_id = doc_id) enables
    * the SEMANTIC dedup stage between span dedup and decontamination:
    * d15's cell-local cosine pruning (first-k-by-id centroid prefix,
    * k = max(16, n/100) — the SemDeDup sizing) drops every doc whose
    * embedding has a strictly-more-central τ-close cell neighbor.
    * Docs without an embedding row pass through unexamined. */
  def pipeline(spark: SparkSession, docs: DataFrame,
      eval: Option[DataFrame], minWords: Int, maxOverlap: Int,
      embeds: Option[DataFrame] = None,
      semanticTau: Double = 0.35,
      dsirTarget: Option[DataFrame] = None,
      stripSpans: Boolean = false, stripKeepFirst: Boolean = false,
      gopher: Boolean = false, pplCut: Boolean = false,
      langAllow: Option[Set[String]] = None,
      langMinHits: Int = 1): Frames = {
    // Each stage is materialized before fan-out: the summary counts,
    // the audit union and the curated write all re-reference these
    // frames, and an un-materialized near-dup stage (the dominant
    // cost) would re-run winnowing + clustering per reference.
    import graft.util.Iter.materialize

    // 0. language allowlist (optional) — the FIRST cut: one narrow
    // row-local filter (the t3 n-gram heuristic with e13's stopword
    // confidence floor), the cheapest signal in the pipeline, and
    // every downstream stage is language-bound. EXACTLY the streaming
    // e13 gate's expression tree (IngestGate.langGate), so the batch
    // stage and the ingest gate agree by construction; the audit
    // reason carries the heuristic's verdict so "why was this
    // dropped" names the detected language.
    val (kept0, droppedLang) = langAllow match {
      case Some(langs) =>
        val kl = materialize(
          graft.streaming.IngestGate.langGate(docs, langs, "text",
            langMinHits).select(col("doc_id")))
        (docs.join(kl, Seq("doc_id"), "left_semi"),
          docs.join(kl, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), lit("lang").as("stage"),
              concat(lit("lang_"), graft.functions.TextAnalysis
                .langId(coalesce(col("text"), lit(""))))
                .as("reason")))
      case None =>
        (docs, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
    }

    // 1. quality filter — keep the reason for the audit frame
    val qf = Curation.qualityFilter(kept0, "doc_id", "text",
        minWords = minWords)
      .select(col("doc_id"), col("reason"), col("keep"))
    val q1 = materialize(kept0.join(qf, "doc_id"))
    val droppedQuality = q1.filter(!col("keep"))
      .select(col("doc_id"), lit("quality").as("stage"), col("reason"))
    val kept1q = q1.filter(col("keep")).drop("keep", "reason")

    // 1.2 the Gopher rule battery (optional): the published
    // web-scale heuristic set, entirely row-local, with the first
    // failing rule as the per-document audit reason
    val (kept1gp, droppedGopher) =
      if (!gopher)
        (kept1q, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
      else {
        val gr = materialize(
          Curation.gopherRules(kept1q, "doc_id", "text")
            .select(col("doc_id"), col("reason"), col("keep")))
        (kept1q.join(gr.filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"), "left_semi"),
          gr.filter(!col("keep"))
            .select(col("doc_id"), lit("gopher").as("stage"),
              col("reason")))
      }

    // 1.3 CCNet perplexity tail cut (optional): score the survivors
    // with the corpus-trained KN model, keep each language's head and
    // middle tertiles (Wenzek et al. 2020's `head+middle` recipe)
    val (kept1pp, droppedPpl) =
      if (!pplCut)
        (kept1gp, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
      else {
        val tails = materialize(
          Curation.perplexityBuckets(kept1gp, "doc_id", "text", "lang")
            .filter(col("bucket") === "tail").select(col("doc_id")))
        (kept1gp.join(tails, Seq("doc_id"), "left_anti"),
          tails.select(col("doc_id"), lit("ppl").as("stage"),
            lit("tail_bucket").as("reason")))
      }

    // 1.5 DSIR importance resampling against the target corpus
    // (optional): ds2's deterministic exp(logw−max) gate — the
    // distribution-shaping stage between rules and dedup
    val (kept1, droppedDsir) = dsirTarget match {
      case Some(tgt) =>
        val out = materialize(Curation.dsirResample(kept1pp, tgt,
            "doc_id", "text")
          .filter(!col("keep")).select(col("doc_id")))
        (kept1pp.join(out, Seq("doc_id"), "left_anti"),
          out.select(col("doc_id"), lit("dsir").as("stage"),
            lit("importance_resample").as("reason")))
      case None =>
        (kept1pp, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
    }

    // 2. exact dedup: lowest id per content hash survives
    val canon = Dedup.exact(kept1, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val droppedExact = kept1.join(canon, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("exact_dup").as("stage"),
        lit("duplicate_text").as("reason"))
    val kept2 = materialize(kept1.join(canon, Seq("doc_id"), "left_semi"))

    // 3. near-dup span dedup: winnow pairs -> clusters -> longest wins
    val clusters = materialize(Dedup.dupClusters(
      Dedup.winnowedDupPairs(kept2, "doc_id", "text"), "id_a", "id_b"))
    val survivors = Dedup.clusterSurvivors(clusters, kept2,
        "doc_id", "text")
      .select(col("keep_id"))
    val nearDupIds = clusters
      .join(survivors, clusters("member_id") === survivors("keep_id"),
        "left_anti")
      .select(col("member_id").as("doc_id"))
    val droppedNear = nearDupIds
      .select(col("doc_id"), lit("near_dup").as("stage"),
        lit("duplicate_span").as("reason"))
    val kept3 = materialize(
      kept2.join(nearDupIds, Seq("doc_id"), "left_anti"))

    // 3.5 semantic dedup over the embeddings sidecar (optional):
    // d15's cell-local pruning on the surviving docs' vectors
    val (kept3s, droppedSem) = embeds match {
      case Some(em) =>
        val vecs = materialize(em
          .select(col("vec_id").cast("long").as("vec_id"),
            col("embedding"))
          .join(kept3.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi"))
        val n = vecs.count()
        val k = math.max(16L, n / 100).toInt
        val centroids: Array[Array[Float]] = vecs
          .orderBy(col("vec_id")).limit(k)
          .collect().map(_.getSeq[Float](1).toArray)
        val semDrops = materialize(
          Dedup.semDedup(vecs, "vec_id", "embedding", centroids,
            semanticTau)
          .filter(!col("keep"))
          .select(col("vec_id").as("doc_id")))
        (kept3.join(semDrops, Seq("doc_id"), "left_anti"),
          semDrops.select(col("doc_id"),
            lit("semantic_dup").as("stage"),
            lit("semantic_duplicate").as("reason")))
      case None =>
        (kept3, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
    }

    // 3.8 corpus-wide duplicated-span stripping (optional): x18's
    // rewrite over the deduped survivors — duplicated spans that
    // outlived near-dup dedup as sub-document fragments are removed
    // from the TEXT itself (RefinedWeb's span removal, applied after
    // dedup so whole-document duplicates don't first shred each
    // other); a doc stripped to nothing is dropped with an audit row,
    // never shipped empty
    val (kept3x, droppedStrip) =
      if (stripKeepFirst) {
        // x24's variant: exact keep-first spans — ONE canonical copy
        // of every duplicated run survives somewhere in the corpus,
        // the rest is excised from the text (Raffel's "all but one")
        val st = materialize(Curation.exciseSpansText(kept3s, "doc_id",
          "text", graft.operators.Dedup.exactDupSpansKeepFirst(
            kept3s, "doc_id", "text")))
        (kept3s.drop("text")
          .join(st.filter(length(trim(col("clean"))) > 0)
            .select(col("doc_id"), col("clean").as("text")), "doc_id"),
          st.filter(length(trim(col("clean"))) === 0)
            .select(col("doc_id"), lit("strip_spans").as("stage"),
              lit("fully_duplicated").as("reason")))
      } else if (!stripSpans)
        (kept3s, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
      else {
        val st = materialize(
          Curation.stripDupSpans(kept3s, "doc_id", "text")
            .select(col("doc_id"), col("kept_tokens"), col("clean_text")))
        (kept3s.drop("text")
          .join(st.filter(col("kept_tokens") > 0L)
            .select(col("doc_id"), col("clean_text").as("text")),
            "doc_id"),
          st.filter(col("kept_tokens") === 0L)
            .select(col("doc_id"), lit("strip_spans").as("stage"),
              lit("fully_duplicated").as("reason")))
      }

    // 4. decontamination against the eval corpus (optional)
    val (kept4, droppedContam) = eval match {
      case Some(ev) =>
        val contaminated = materialize(Curation.contamination(kept3x,
            ev, "doc_id", "text")
          .filter(col("n_overlap") >= maxOverlap)
          .select(col("doc_id")))
        (kept3x.join(contaminated, Seq("doc_id"), "left_anti"),
          contaminated.select(col("doc_id"),
            lit("decontaminate").as("stage"),
            lit("eval_overlap").as("reason")))
      case None =>
        (kept3x, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
    }

    // 5. leakage-safe split over the SAME near-dup clusters
    val split = Curation.leakSafeSplit(kept4, "doc_id", clusters)
      .select(col("doc_id"), col("split"))
    val k4 = materialize(kept4)
    Frames(
      curated = k4.join(split, "doc_id"),
      dropped = droppedLang.union(droppedQuality).union(droppedGopher)
        .union(droppedPpl)
        .union(droppedDsir).union(droppedExact)
        .union(droppedNear)
        .union(droppedSem).union(droppedStrip).union(droppedContam))
  }

  def run(spark: SparkSession, args: Args): Summary = {
    import graft.util.Iter.materialize
    val docs = graft.util.Tables.documents(spark, args.inputDir)
    val input = docs.count()
    val frames = pipeline(spark, docs,
      args.evalDir.map(ed => graft.util.Tables.documents(spark, ed)),
      args.minWords, args.maxOverlap,
      embeds = if (args.semantic)
        Some(graft.util.Tables.embeddings(spark, args.inputDir))
      else None,
      semanticTau = args.semanticTau,
      dsirTarget = args.dsirTargetDir.map(dt =>
        graft.util.Tables.documents(spark, dt)),
      stripSpans = args.stripSpans,
      stripKeepFirst = args.stripKeepFirst, gopher = args.gopher,
      pplCut = args.pplCut, langAllow = args.langAllow,
      langMinHits = args.langMinHits)

    // 6. shard-numbered, split-partitioned write (x2's seeded layout;
    // shard/pos join back on id so payload columns ride along)
    val shards = Curation.shuffleShards(frames.curated, "doc_id",
      args.shards, seed = "curate")
    val curated = materialize(frames.curated.join(shards, "doc_id"))
    curated.write.mode("overwrite").partitionBy("split")
      .parquet(s"${args.outputDir}/curated")
    val dropped = materialize(frames.dropped)
    dropped.write.mode("overwrite").parquet(s"${args.outputDir}/dropped")
    // optional delivery format: one tar shard set per split (x13's
    // manifested sink — the layout trainers stream)
    if (args.tarShards)
      curated.select(col("split")).distinct().collect()
        .map(_.getString(0)).foreach { sp =>
          graft.sources.TarShards.write(
            curated.filter(col("split") === sp)
              .select(col("doc_id").cast("string").as("name"),
                encode(col("text"), "UTF-8").as("payload")),
            "name", "payload", s"${args.outputDir}/shards/$sp",
            nShards = args.shards)
        }

    // optional model distillation: train the lr1 classifier on the
    // rule verdicts over the FULL input (keeps and drops both carry
    // signal), write every document's score — the serving artifact
    // the next ingest run's IngestGate.scoreGate ships as literals
    val weights =
      if (!args.distill) None
      else {
        import graft.operators.LogReg
        val t = coalesce(col("text"), lit(""))
        val (f1, f2, f3) = LogReg.qualityFeatures(t, length(t))
        // the stage-1 verdicts are already materialized in the audit
        // frame — an anti-join against its quality drops beats
        // re-running the regex-heavy rule pass over the full corpus
        val qualityDrops = dropped
          .filter(col("stage") === "quality").select(col("doc_id"))
        val feats = docs
          .join(qualityDrops.withColumn("q_drop", lit(true)),
            Seq("doc_id"), "left")
          .select(col("doc_id"), f1.as("f1"), f2.as("f2"), f3.as("f3"),
            col("q_drop").isNull.cast("double").as("y"))
          .filter(col("f1") > 0.0) // zero-token rows have NaN features
        val fs = Seq("f1", "f2", "f3")
        val w = LogReg.train(feats, "y", fs)
        feats.select(col("doc_id"),
            (LogReg.score(w, fs).cast("decimal(24,6)") *
              lit(1000000L).cast("decimal(7,0)")).cast("bigint")
              .as("score_e6"))
          .write.mode("overwrite").parquet(s"${args.outputDir}/scores")
        Some(w.toSeq)
      }

    // optional packed-payload delivery (l6): per split, the curated
    // survivors next-fit-packed into strict token-budget rows — the
    // trainer-ready payload, one exchange per split, the whole
    // tokenize → curate → pack → write chain closed in one CLI run
    if (args.packBudget > 0) {
      val packable = curated.select(col("doc_id"), col("split"),
        col("shard"), col("text"),
        graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n_tok"))
      packable.select(col("split")).distinct().collect()
        .map(_.getString(0)).foreach { sp =>
          graft.operators.Layout.packPayloads(
            packable.filter(col("split") === sp),
            "doc_id", "n_tok", "text", "shard", args.packBudget)
          .write.mode("overwrite")
          .parquet(s"${args.outputDir}/packed/$sp")
        }
    }

    // optional concat-and-chunk manifests (x15): per split, every
    // document's token-range in the (shard, doc_id)-ordered virtual
    // stream — the shuffled pack order a trainer consumes
    if (args.chunkLen > 0) {
      val counted = curated.select(col("doc_id"), col("split"),
        col("shard"),
        size(org.apache.spark.sql.functions.filter(
          split(trim(col("text")), "\\s+"), w => w =!= ""))
          .cast("bigint").as("n_tok"))
      counted.select(col("split")).distinct().collect()
        .map(_.getString(0)).foreach { sp =>
          Curation.concatChunkOffsets(
            counted.filter(col("split") === sp), "doc_id", "n_tok",
            col("shard"), args.chunkLen)
          .write.mode("overwrite")
          .parquet(s"${args.outputDir}/chunks/$sp")
        }
    }

    // summary from the in-plan frame: a fully-dropped corpus leaves an
    // empty (schema-less) parquet dir that a validating re-read would
    // refuse to infer
    def stageCount(stage: String): Long =
      dropped.filter(col("stage") === stage).count()
    Summary(
      input = input,
      lowQuality = stageCount("quality"),
      exactDups = stageCount("exact_dup"),
      nearDups = stageCount("near_dup"),
      semanticDups = stageCount("semantic_dup"),
      contaminated = stageCount("decontaminate"),
      curated = curated.count(),
      distillWeights = weights,
      dsirDropped = stageCount("dsir"),
      strippedEmpty = stageCount("strip_spans"),
      gopherDropped = stageCount("gopher"),
      pplTailDropped = stageCount("ppl"),
      langDropped = stageCount("lang"),
      splits = curated.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName("graft-curate")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val s = run(spark, args)
    // one machine-readable line, the Bench/Manifest convention
    import graft.util.Json._
    println(render(JObj(Seq(
      "input" -> JInt(s.input), "low_quality" -> JInt(s.lowQuality),
      "exact_dups" -> JInt(s.exactDups), "near_dups" -> JInt(s.nearDups),
      "semantic_dups" -> JInt(s.semanticDups),
      "contaminated" -> JInt(s.contaminated),
      "lang_dropped" -> JInt(s.langDropped),
      "dsir_dropped" -> JInt(s.dsirDropped),
      "stripped_empty" -> JInt(s.strippedEmpty),
      "curated" -> JInt(s.curated),
      "splits" -> JObj(s.splits.toSeq.sorted.map {
        case (k, v) => k -> (JInt(v): JValue) }))
      ++ s.distillWeights.map(w =>
        "distill_weights" -> (JArr(w.map(JDouble(_))): JValue)))))
    spark.stop()
  }
}
