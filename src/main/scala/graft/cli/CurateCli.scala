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
  *   [--eval-dir=DIR]      decontaminate against this eval corpus (d8)
  *   [--min-words=20]      x11 quality-rule floor
  *   [--max-overlap=2]     drop docs sharing >= this many eval shingles
  *   [--shards=8]          packed shards per split (x2 layout)
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
      maxOverlap: Int = 2, shards: Int = 8)

  def parseArgs(argv: Array[String]): Args = {
    val kv = "--([a-z-]+)=(.*)".r
    val m = argv.collect { case kv(k, v) => k -> v }.toMap
    def req(k: String): String = m.getOrElse(k,
      throw new IllegalArgumentException(s"missing required --$k=..."))
    Args(
      inputDir = req("input-dir"),
      outputDir = req("output-dir"),
      evalDir = m.get("eval-dir"),
      minWords = m.get("min-words").map(_.toInt).getOrElse(20),
      maxOverlap = m.get("max-overlap").map(_.toInt).getOrElse(2),
      shards = m.get("shards").map(_.toInt).getOrElse(8))
  }

  case class Summary(
      input: Long, lowQuality: Long, exactDups: Long, nearDups: Long,
      contaminated: Long, curated: Long,
      splits: Map[String, Long])

  def run(spark: SparkSession, args: Args): Summary = {
    // Each stage is materialized before fan-out: the summary counts,
    // the audit union and the curated write all re-reference these
    // frames, and an un-materialized near-dup stage (the dominant
    // cost) would re-run winnowing + clustering per reference.
    import graft.util.Iter.materialize
    val docs = graft.util.Tables.documents(spark, args.inputDir)
    val input = docs.count()

    // 1. quality filter — keep the reason for the audit frame
    val qf = Curation.qualityFilter(docs, "doc_id", "text",
        minWords = args.minWords)
      .select(col("doc_id"), col("reason"), col("keep"))
    val q1 = materialize(docs.join(qf, "doc_id"))
    val droppedQuality = q1.filter(!col("keep"))
      .select(col("doc_id"), lit("quality").as("stage"), col("reason"))
    val kept1 = q1.filter(col("keep")).drop("keep", "reason")

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

    // 4. decontamination against the eval corpus (optional)
    val (kept4, droppedContam) = args.evalDir match {
      case Some(ed) =>
        val eval = graft.util.Tables.documents(spark, ed)
        val contaminated = materialize(Curation.contamination(kept3,
            eval, "doc_id", "text")
          .filter(col("n_overlap") >= args.maxOverlap)
          .select(col("doc_id")))
        (kept3.join(contaminated, Seq("doc_id"), "left_anti"),
          contaminated.select(col("doc_id"),
            lit("decontaminate").as("stage"),
            lit("eval_overlap").as("reason")))
      case None =>
        (kept3, spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).limit(0)
          .select(col("doc_id"), lit("").as("stage"), lit("").as("reason")))
    }

    // 5. leakage-safe split over the SAME near-dup clusters
    val split = Curation.leakSafeSplit(kept4, "doc_id", clusters)
      .select(col("doc_id"), col("split"))

    // 6. shard-numbered, split-partitioned write (x2's seeded layout;
    // shard/pos join back on id so payload columns ride along)
    val k4 = materialize(kept4)
    val shards = Curation.shuffleShards(k4, "doc_id", args.shards,
      seed = "curate")
    val curated = materialize(
      k4.join(split, "doc_id").join(shards, "doc_id"))
    curated.write.mode("overwrite").partitionBy("split")
      .parquet(s"${args.outputDir}/curated")
    droppedQuality.union(droppedExact).union(droppedNear)
      .union(droppedContam)
      .write.mode("overwrite").parquet(s"${args.outputDir}/dropped")

    // summary from the in-plan frame: a fully-dropped corpus leaves an
    // empty (schema-less) parquet dir that a validating re-read would
    // refuse to infer
    Summary(
      input = input,
      lowQuality = droppedQuality.count(),
      exactDups = droppedExact.count(),
      nearDups = droppedNear.count(),
      contaminated = droppedContam.count(),
      curated = curated.count(),
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
      "contaminated" -> JInt(s.contaminated),
      "curated" -> JInt(s.curated),
      "splits" -> JObj(s.splits.toSeq.sorted.map {
        case (k, v) => k -> (JInt(v): JValue) })))))
    spark.stop()
  }
}
