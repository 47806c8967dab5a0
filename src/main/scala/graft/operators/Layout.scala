package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout: multi-dimensional clustering (Z-order) and
  * target-size compaction — the write-side tools that decide what a
  * 100 TB table COSTS to read later.
  *
  * One-dimensional sort (or range partitioning) gives perfect
  * min/max pruning on one column and none on the others. Interleaving
  * the bits of several columns into a Z-value and range-clustering on
  * it (Delta/Iceberg's `ZORDER BY`) keeps rows close in EVERY
  * interleaved dimension: a 2-D box predicate then touches a small
  * corner of the files, and any stats-aware reader (parquet row-group
  * min/max, file skipping) drops the rest — [[LayoutSpec]] measures
  * exactly that locality. Compaction bounds the other failure mode:
  * thousands of small files (listing + open overhead dominating) or
  * few giant ones (no parallelism).
  */
object Layout {

  /** Z-value (Morton code) of pre-scaled non-negative int columns:
    * bit `b` of column `i` lands at interleaved position
    * `b·n + i`. Pure shift/mask column algebra — codegen'd, no UDF,
    * no shuffle. Caller guarantees inputs fit `bits` bits
    * (use [[zorderBy]] for automatic range scaling). */
  def zvalue(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits * cols.length <= 62,
      s"$bits bits x ${cols.length} cols overflows a long")
    val n = cols.length
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` into `nFiles` range partitions of the Z-value over
    * `cols`, each sorted by it — write the result and every
    * interleaved dimension gets locality. Column ranges are scaled to
    * `bits`-bit ints from a driver-side min/max pass (2·|cols| scalars
    * — bounded driver state); degenerate (constant) columns scale to
    * 0 and drop out of the interleave. The range partitioning costs
    * ONE shuffle at write time — the read-side pruning it buys is
    * permanent, the same buy-once economics as
    * [[Bucketing.writeBucketed]]. */
  def zorderBy(df: DataFrame, cols: Seq[String], nFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = scaledZ(df, cols, bits)
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
  }

  /** The Z-value column [[zorderBy]] clusters on, exposed so the
    * interleave arithmetic itself is oracle-checkable (l1_zorder
    * recomputes min/max scaling + Morton interleave in DuckDB): each
    * column is affinely scaled to [0, 2^bits) from a driver-side
    * min/max pass (truncating double→long cast, constant columns
    * scale to 0), then bit-interleaved by [[zvalue]]. */
  def scaledZ(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val maxCode = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val mn = row.getDouble(2 * i)
      val mx = row.getDouble(2 * i + 1)
      if (mx == mn) lit(0L)
      else least(lit(maxCode), greatest(lit(0L),
        ((col(c).cast("double") - mn) / (mx - mn) * maxCode).cast("long")))
    }
    zvalue(bits, scaled: _*)
  }

  /** Repartition `df` so each output file lands near `targetBytes`,
    * using the optimizer's size estimate (exact for parquet scans —
    * it is the file footprint). `even = false` (default) COALESCES:
    * a narrow, shuffle-free merge of existing partitions — the cheap
    * fix for the small-files problem after a selective filter.
    * `even = true` pays one round-robin shuffle for evenly-sized
    * outputs — worth it when the input is skewed and a straggler
    * file would gate downstream scans. */
  def compactToSize(df: DataFrame, targetBytes: Long,
      even: Boolean = false): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      math.ceil(bytes.toDouble / targetBytes.toDouble).toInt)
    if (even) df.repartition(parts) else df.coalesce(parts)
  }

  /** MERGE-style upsert (the Delta/Iceberg `MERGE INTO ... WHEN
    * MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` shape as plain
    * DataFrame algebra): batch rows REPLACE lake rows with the same
    * key; all other lake rows survive. Copy-on-write semantics — the
    * result is the new table version, written back wholesale or (on a
    * partitioned lake) only to the partitions the batch touches
    * (ImportJob's dynamic partition overwrite is the write half).
    *
    * Scale shape: ONE key-keyed anti-join — the batch key set is the
    * small side probed against the lake scan; the batch itself unions
    * in for free (no shuffle). The broadcast decision is left to the
    * planner/AQE (a hard `broadcast()` hint would ABORT on a large
    * backfill batch instead of degrading to the shuffle join — and
    * the streaming CDC path feeds arbitrary batch sizes through
    * here). Nothing touches lake rows whose keys the batch misses,
    * and with a partitioned write only touched partitions rewrite.
    *
    * Batch keys must be unique (the reference semantics of MERGE —
    * duplicate batch keys make the update ambiguous); enforce upstream
    * with [[Dedup.exact]] when in doubt. */
  def upsert(lake: DataFrame, batch: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = batch.select(keyCols.map(col): _*).distinct()
    batch.unionByName(
      lake.join(keys, keyCols, "left_anti"))
  }

  /** Snapshot diff: reconcile two versions of a table by key —
    * (key, change) rows where change ∈ {added, removed, changed}.
    * `changed` compares an md5 over the concatenated non-key columns
    * (cheap, engine-reproducible), so the diff never shuffles payload
    * columns — only keys and 32-char hashes. The lake-audit primitive:
    * "what did this ingest actually do" must be answerable without
    * reading either version twice. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame): DataFrame = {
      val others = df.columns.filterNot(keyCols.contains).sorted
      // per-column null marker BEFORE the concat: concat_ws silently
      // SKIPS null arguments, which would make NULL vs '' and
      // null-position swaps hash as "unchanged"; the v/n prefix keeps
      // NULL distinct from every real value, and the separator keeps
      // column boundaries from colliding ("ab"+"c" vs "a"+"bc")
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001",
          others.map(c =>
            coalesce(concat(lit("v"), col(c).cast("string")),
              lit("n"))): _*)).as("__h"): _*)
    }
    val b = hashed(before)
    val a = hashed(after)
    b.withColumnRenamed("__h", "__hb")
      .join(a.withColumnRenamed("__h", "__ha"), keyCols, "full_outer")
      .filter(col("__hb").isNull || col("__ha").isNull ||
        col("__hb") =!= col("__ha")) // unchanged rows drop out
      .select(keyCols.map(col) :+
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"): _*)
  }

  /** Greedy next-fit sequence packing: assign each document to a
    * fixed-length-budget pack — the delivery stage of a training-data
    * pipeline, where examples are concatenated into fixed-length
    * model sequences and every padding token is wasted compute.
    *
    * Policy siblings: [[graft.operators.Curation.packSequences]] (x3)
    * is the ONE-WINDOW contiguous policy — bins may overflow by one
    * straddling document, trailing bins run short — right when a
    * boundary-crossing doc is acceptable (loss-masked packing).
    * This operator (l5) is STRICT next-fit: no multi-doc pack ever
    * exceeds the budget (only a single oversized doc can), the
    * invariant required when sequences are hard-truncated.
    *
    * Scale shape: ONE hash shuffle on `shardCol` plus an in-partition
    * sort, then a streaming O(1)-state fold — no group
    * materialization, no window, no driver state. Shard count is the
    * parallelism knob; packing is independent per shard by
    * construction (the fold resets on shard change), so the result is
    * identical under any partition count, AQE coalescing, or retry.
    * Next-fit (not best-fit) is deliberate at scale: it needs no
    * lookahead and no bin state beyond the open pack, and its fill
    * loss vs optimal is AUDITABLE, not guessed — `fill_after` on the
    * last row of a pack is that pack's used budget.
    *
    * Contract: docs pack in ascending `idCol` order within a shard; a
    * doc appends to the open pack unless `fill + len` would exceed
    * `budget`, in which case a new pack opens. A doc longer than
    * `budget` occupies its own overflowing pack (`fill_after >
    * budget` flags it) and never blocks its successors. Output: one
    * row per input doc — (shard, id, len, pack_seq, pos_in_pack,
    * fill_after); a pack is the composite key (shard, pack_seq). */
  def packSequences(df: DataFrame, idCol: String, lenCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // one open pack per shard is the entire state; shards arrive
        // contiguously (sorted) so a shard change resets the fold
        var shard = 0L; var pack = 0L; var fill = 0L; var pos = 0L
        var started = false
        it.map { case (s, id, n) =>
          require(n >= 0, s"negative length $n for id $id")
          if (!started || s != shard) {
            shard = s; pack = 1L; fill = 0L; pos = 0L; started = true
          }
          // occupancy (pos), not fill, guards the new-pack rule: a
          // zero-length doc OCCUPIES the open pack at fill 0, and an
          // oversized successor must still take its own pack
          if (pos > 0 && fill + n > budget) {
            pack += 1L; fill = 0L; pos = 0L
          }
          fill += n; pos += 1L
          (s, id, n, pack, pos, fill)
        }
      }
      .toDF("shard", "id", "len", "pack_seq", "pos_in_pack",
        "fill_after")
  }

  /** Materialized next-fit packs: one row per [[packSequences]] pack
    * with the member documents' payloads concatenated in pack order
    * (`\n` boundary — the EOS stand-in, [[graft.operators.Curation
    * .packedPayloads]]'s convention) — the training-shard payload
    * under the STRICT budget policy, emitted by the SAME
    * single-exchange fold: the concat buffer is the open pack
    * (bounded by `budget` characters-worth of members, plus the one
    * oversized doc), completed packs stream out as the fold passes
    * them, and nothing is ever grouped or windowed. Pack numbering is
    * identical to [[packSequences]] by construction (one rule, two
    * emitters — spec-pinned).
    *
    * @return (shard, pack_seq, n_docs, n_tokens, payload). */
  def packPayloads(df: DataFrame, idCol: String, lenCol: String,
      textCol: String, shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"),
        col(textCol).cast("string").as("text"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Long, String)]
      .mapPartitions { it =>
        var shard = 0L; var pack = 0L; var fill = 0L; var nDocs = 0L
        var buf = new java.lang.StringBuilder
        var started = false
        def emit(): (Long, Long, Long, Long, String) =
          (shard, pack, nDocs, fill, buf.toString)
        def reset(): Unit = { fill = 0L; nDocs = 0L
          buf = new java.lang.StringBuilder }
        val completed = it.flatMap { case (s, id, n, text) =>
          require(n >= 0, s"negative length $n for id $id")
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, String)]
          if (!started) { started = true; shard = s; pack = 1L }
          else if (s != shard) {
            out += emit(); shard = s; pack = 1L; reset()
          } else if (nDocs > 0 && fill + n > budget) {
            // occupancy, not fill — see packSequences' guard
            out += emit(); pack += 1L; reset()
          }
          if (nDocs > 0) buf.append('\n')
          buf.append(text); fill += n; nDocs += 1L
          out
        }
        // the open pack flushes AFTER the element stream is exhausted
        // (Iterator ++ is lazy; hasNext reads the fold state then)
        val tail = new Iterator[(Long, Long, Long, Long, String)] {
          private var done = false
          def hasNext: Boolean = started && !done
          def next(): (Long, Long, Long, Long, String) = {
            done = true; emit()
          }
        }
        completed ++ tail
      }
      .toDF("shard", "pack_seq", "n_docs", "n_tokens", "payload")
  }

  /** Incremental next-fit packing: assign an arriving batch to NEW
    * packs whose numbering continues each shard's [[packSequences]]
    * sequence — the d10/d21 incremental convention applied to
    * delivery. Arriving docs NEVER join the base run's trailing
    * packs: shipped packs are immutable artifacts (rewriting one
    * invalidates whatever already trained on it), so the append-only
    * trade is a little trailing-pack slack per refresh, exactly the
    * l3 lake economics. Cost is batch-sized: the base contributes
    * only its per-shard max pack_seq (an aggregate, broadcast-sized),
    * never its rows.
    *
    * @param base a prior [[packSequences]] output (or any frame with
    *             shard/pack_seq); shards absent from it start at 1.
    * @return [[packSequences]] schema over the batch only. */
  def packSequencesIncremental(batch: DataFrame, idCol: String,
      lenCol: String, shardCol: String, budget: Long,
      base: DataFrame): DataFrame = {
    val offsets = base.groupBy(col("shard"))
      .agg(max(col("pack_seq")).as("pack_off"))
    packSequences(batch, idCol, lenCol, shardCol, budget)
      .join(broadcast(offsets), Seq("shard"), "left")
      .select(col("shard"), col("id"), col("len"),
        (col("pack_seq") + coalesce(col("pack_off"), lit(0L)))
          .as("pack_seq"),
        col("pos_in_pack"), col("fill_after"))
  }
}
