package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling, seeded global shuffle into shards, train/eval
  * n-gram decontamination and corpus n-gram frequency.
  *
  * Everything is keyed on md5-derived hashes (see
  * [[Dedup.tokenHash32]]) rather than `rand()`: the same corpus and
  * seed always select the same sample, shard layout, or contamination
  * set — on any engine, any partitioning, any retry. Sampling with
  * `rand()` breaks task-retry determinism (Spark may recompute a
  * partition after a sample was consumed downstream) and cannot be
  * oracle-checked; hash gating has neither problem.
  *
  * Scale notes (100 TB): sampling and sharding are single-pass —
  * sampling is a pure filter (no shuffle at all, combines with scan
  * pruning); sharding is ONE hash shuffle keyed by shard followed by an
  * in-shard sort, the exact shape of a training-data writer
  * (`nShards` chosen so one shard fits an executor: e.g. 100 TB /
  * 512 MB ≈ 200k shards). Decontamination shuffles fixed-width 16-byte
  * md5 keys, never the n-gram strings, and the eval side of the join is
  * broadcast when small.
  */
object Curation {

  /** Deterministic per-row draw in [0, 10000): md5 of `"seed:id"`. */
  def sampleDraw(seed: String, id: Column): Column =
    Dedup.tokenHash32(concat_ws(":", lit(seed), id.cast("string"))) % 10000

  /** Stratified sample with per-stratum rates: keep a row iff its
    * seeded hash draw falls under its stratum's rate. Rates are exact
    * in expectation and the selection is a pure narrow filter —
    * pushes below wide operators and costs no shuffle.
    *
    * @param rates      stratum value → keep rate in [0,1]
    * @param defaultRate rate for strata not in `rates`
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      seed: String): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * 10000).toLong))
          .otherwise(acc)
    }
    df.filter(sampleDraw(seed, col(idCol)) < threshold)
  }

  /** Seeded global shuffle into `nShards` balanced shards: shard =
    * hash mod nShards (balanced in expectation, deterministic), pos =
    * rank within the shard by (hash, id). The output order within a
    * shard IS the training read order — reshuffling an epoch is a new
    * seed, not a new job design.
    *
    * One hash shuffle + per-shard sort; no global sort, no
    * driver-side state. Returns (idCol, shard, pos). */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame = {
    val h = Dedup.tokenHash32(
      concat_ws(":", lit(seed), col(idCol).cast("string")))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard"))
          .orderBy(col("h"), col(idCol))).cast("int"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Train/eval decontamination: for each training document, the number
    * of DISTINCT word-k-gram shingles it shares with the eval corpus
    * (the standard n-gram-overlap test-set-leakage check). Only
    * contaminated documents (n_overlap > 0) are returned — at corpus
    * scale the clean majority would dominate the output for no
    * information.
    *
    * Join keys are md5 digests of the shingles — fixed-width 16-byte
    * comparisons through the shuffle instead of arbitrary-length
    * strings. The eval side is `broadcast()` when `broadcastEval`
    * (eval sets are typically 1e4-1e6 shingles — megabytes); disable
    * for eval corpora that rival the training corpus in size.
    */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3,
      broadcastEval: Boolean = true): DataFrame = {
    graft.functions.ShinglesImpl.register(train.sparkSession)
    def hashed(df: DataFrame): DataFrame =
      df.select(col(idCol),
          explode(expr(s"word_shingles($textCol, $k)")).as("sh"))
        .select(col(idCol), md5(col("sh")).as("h"))
        .distinct()
    val ev = hashed(eval).select(col("h")).distinct()
    hashed(train)
      .join(if (broadcastEval) broadcast(ev) else ev, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Pack documents into fixed-token-budget bins ("sequences") for
    * training: documents stream through their shard in seeded-shuffle
    * order and fall into consecutive bins of `budget` tokens — bin =
    * floor(tokens-before-this-doc / budget). A document straddling a
    * boundary stays in the earlier bin (bins overflow by at most one
    * document; the trailing bin of a shard may run short) — the
    * standard contiguous-packing policy, chosen because it needs ONE
    * windowed pass. True first-fit/best-fit packing is a sequential
    * fold per shard and buys only the boundary documents.
    *
    * Plan shape: one hash shuffle (by shard) + one in-shard sort
    * shared by both window functions — the same single-exchange shape
    * as [[shuffleShards]], and the window state is a running sum, O(1)
    * per row. Returns (idCol, n_tokens, shard, bin, pos) where pos is
    * the document's rank inside its bin. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, budget: Long, seed: String): DataFrame = {
    val h = Dedup.tokenHash32(
      concat_ws(":", lit(seed), col(idCol).cast("string")))
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col(idCol))
    val before = sum(col("n_tokens")).over(
      byShard.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(idCol),
        graft.functions.TextAnalysis.tokenCount(col(textCol))
          .cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("bin",
        floor(coalesce(before, lit(0L)) / budget).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"), col("bin"))
          .orderBy(col("h"), col(idCol))).cast("int"))
      .select(col(idCol), col("n_tokens"), col("shard"), col("bin"),
        col("pos"))
  }

  /** Corpus-level top-N word k-grams by frequency (vocabulary /
    * boilerplate analysis; also the building block for n-gram LM
    * filtering). Counting is a partial-aggregated groupBy on the
    * shingle string; the top-N cut is a `TakeOrdered` (k·partitions
    * rows to the driver, never the full count table). Ties at the
    * cut break lexicographically, so the result is deterministic. */
  def topNgrams(df: DataFrame, textCol: String, k: Int,
      topN: Int): DataFrame = {
    graft.functions.ShinglesImpl.register(df.sparkSession)
    df.select(explode(expr(s"word_shingles($textCol, $k)")).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(topN)
  }
}
