package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count as a bounded-state ingest signal (e16):
  * "how many distinct keys has this stream seen, per epoch prefix" —
  * the dedup-rate / coverage monitor an ingest pipeline watches
  * (distinct users, distinct URLs, distinct source domains), the
  * DISTINCT sibling of [[HeavyHitterStream]]'s counts.
  *
  * Determinism (the replay convention): HyperLogLog register state is
  * a per-bucket MAX — commutative, associative, idempotent — so the
  * state after any prefix depends only on the prefix KEY SET, never
  * on arrival order, duplication, micro-batch boundaries, or the
  * merge tree (duplicates are absorbed for free, the property that
  * makes the sketch a DISTINCT counter). The estimate is computed
  * from the registers with a PINNED float recipe — the 2^-M terms
  * summed in bucket order as a left fold, the Flajolet et al. 2007
  * small-range linear-counting branch on exact integer V — so the
  * DuckDB oracle replays every emitted estimate bit-exactly from the
  * same md5 register derivation (the b6/t13 precedent: ln on both
  * engines, e6-cut output).
  *
  * Geometry: m = 64 registers (fixed — the register VECTOR is the
  * whole state: 64 small ints, mergeable by element-wise max), rank
  * = trailing zeros + 1 of the hash's upper 54 bits (P(rank = r) =
  * 2^-r exactly, and trailing zeros replay as one integer identity:
  * bit_count((w-1) & ~w)). Standard error 1.04/√64 ≈ 13% — the
  * monitoring tier; a wider production sketch changes m, nothing
  * else.
  *
  * Epoch semantics are [[HeavyHitterStream]]'s: `batchCol` is a
  * data-derived epoch fed non-decreasing; emission identity with the
  * batch fold needs epoch-aligned micro-batches, and the FINAL state
  * is order-independent regardless.
  */
object CardinalityStream extends Serializable {

  private val M = 64
  private val Alpha = 0.709 // Flajolet et al. 2007, alpha_64

  /** One emission: after folding epoch `batch`, the prefix has seen
    * `n_prefix` events whose distinct-key estimate is
    * `est_e6` = floor(estimate · 1e6). */
  case class CardinalityEstimate(batch: Long, n_prefix: Long,
      est_e6: Long)

  private[streaming] case class HllState(n: Long, regs: Seq[Int])

  /** The shared estimate recipe — S summed in bucket order as a left
    * fold from 0.0, linear counting when raw ≤ 2.5·m with empty
    * registers present. Mirrored term for term by the SQL replay. */
  private[streaming] def estimate(regs: Array[Int]): Double = {
    var s = 0.0
    var v = 0
    var j = 0
    while (j < M) {
      s += 1.0 / (1L << regs(j)).toDouble
      if (regs(j) == 0) v += 1
      j += 1
    }
    val raw = Alpha * (M.toDouble * M.toDouble) / s
    if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v)
    else raw
  }

  /** 60-bit md5 of "seed:key" — bucket = low 6 bits' worth (mod m),
    * rank from the remaining 54. */
  private def hashCol(seed: String,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(seed + ":"), key)), 1, 15), 16, 10)
      .cast("long")

  private[streaming] def bucketRankJvm(seed: String,
      key: String): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$seed:$key".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val b = (v % M).toInt
    val w = v / M
    val rank = if (w == 0L) 55
      else java.lang.Long.bitCount((w - 1L) & ~w) + 1
    (b, rank)
  }

  /** BATCH form — the oracle-facing replay: fold epochs in order,
    * emit each epoch's prefix estimate.
    *
    * Scale shape: ONE corpus-sized exchange — the (epoch, bucket)
    * partial-agg carrying max(rank) AND the event count (so the
    * prefix totals need no second scan, the e15 lesson). Everything
    * downstream is register-sized: the cumulative max window and the
    * estimate fold run over ≤ m·B rows, corpus-independent. */
  def distinctEstimateBatch(events: DataFrame, keyCol: String,
      batchCol: String, seed: String): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col(batchCol).cast("long").as("batch"),
      col(keyCol).cast("string").as("key"))
    // per (epoch, bucket): the max rank AND the event count, in the
    // single corpus-sized exchange (no second scan for the totals —
    // the e15 lesson); trailing zeros replay as the integer identity
    // bit_count((w-1) & ~w)
    val br = ev
      .select(col("batch"), hashCol(seed, col("key")).as("v"))
      // shiftright, never `/`: Column division is DOUBLE division,
      // which loses low bits of a 60-bit hash
      .select(col("batch"), (col("v") % lit(M.toLong)).as("bucket"),
        shiftright(col("v"), 6).as("w"))
      .select(col("batch"), col("bucket"),
        when(col("w") === 0L, lit(55))
          .otherwise(bit_count((col("w") - lit(1L))
            .bitwiseAND(bitwise_not(col("w")))) + lit(1))
          .as("rank"))
      .groupBy(col("batch"), col("bucket"))
      .agg(max(col("rank")).cast("int").as("r"),
        count(lit(1)).as("cnt"))
    // prefix registers on the (epoch × bucket) GRID (≤ m·B rows —
    // register-sized, corpus-independent): cumulative max ignores the
    // nulls of untouched buckets, empty registers coalesce to 0
    val grid = br.select(col("batch")).distinct()
      .crossJoin(spark.range(0, M).select(col("id").as("bucket")))
    val wCum = Window.partitionBy(col("bucket")).orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val regs = grid
      .join(br.select(col("batch"), col("bucket"), col("r")),
        Seq("batch", "bucket"), "left")
      .select(col("batch"), col("bucket"),
        coalesce(max(col("r")).over(wCum), lit(0)).as("reg"))
    val wNp = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val np = br.groupBy(col("batch")).agg(sum(col("cnt")).as("nb"))
      .select(col("batch"), sum(col("nb")).over(wNp).as("n_prefix"))
    // the estimate fold, mirrored on [[estimate]] term for term: the
    // 2^-reg terms are EXACT doubles shipped as a literal lookup (an
    // integer shift then divide on every engine — never pow), summed
    // in bucket order as a left fold from 0.0
    val inv = typedLit((0 to 55).map(r => 1.0 / (1L << r).toDouble))
    val arr = regs.groupBy(col("batch"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("reg"))))
        .as("a"))
    val s = aggregate(col("a"), lit(0.0),
      (acc, x) => acc + element_at(inv, x("reg") + lit(1)))
    val vZero = size(filter(col("a"), x => x("reg") === lit(0)))
    val raw = lit(Alpha) * lit(M.toDouble * M.toDouble) / col("s")
    val est = when(raw <= lit(2.5 * M) && col("vz") > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / col("vz").cast("double")))
      .otherwise(raw)
    arr.select(col("batch"), s.as("s"), vZero.as("vz"))
      .join(broadcast(np), Seq("batch"))
      .select(col("batch"), col("n_prefix"),
        floor(est * lit(1e6)).cast("bigint").as("est_e6"))
  }

  /** The gate's register state computed OFFLINE over a finished
    * corpus — one distributed (bucket, max rank) aggregation; what a
    * fresh deployment seeds from ([[writeHllGateState]] /
    * [[loadHllGateState]]), so the stream starts knowing the lake's
    * distincts. */
  def hllGateState(events: DataFrame, keyCol: String,
      seed: String): (Long, Vector[Int]) = {
    val ev = events.select(col(keyCol).cast("string").as("key"))
    val rows = ev
      .select(hashCol(seed, col("key")).as("v"))
      .select((col("v") % lit(M.toLong)).as("bucket"),
        shiftright(col("v"), 6).as("w"))
      .select(col("bucket"),
        when(col("w") === 0L, lit(55))
          .otherwise(bit_count((col("w") - lit(1L))
            .bitwiseAND(bitwise_not(col("w")))) + lit(1))
          .as("rank"))
      .groupBy(col("bucket"))
      .agg(max(col("rank")).as("r"), count(lit(1)).as("c"))
      .collect()
    val regs = new Array[Int](M)
    rows.foreach(r => regs(r.getLong(0).toInt) = r.getInt(1))
    // the per-bucket counts carry the total — no second source scan
    (rows.map(_.getLong(2)).sum, regs.toVector)
  }

  /** Persist/load the register state with the seed pinned in `_meta`
    * (the gate-artifact convention — resuming under a foreign hash
    * seed is silently wrong, so the load REFUSES a mismatch). */
  def writeHllGateState(spark: org.apache.spark.sql.SparkSession,
      n: Long, regs: Seq[Int], seed: String, table: String): Unit = {
    import spark.implicits._
    require(regs.length == M, s"need $M registers, got ${regs.length}")
    graft.operators.Bucketing.dropTableAndLocation(spark, table)
    graft.operators.Bucketing.dropTableAndLocation(spark,
      s"${table}_meta")
    regs.zipWithIndex.map { case (r, i) => (i, r) }
      .toDF("bucket", "r")
      .write.mode("overwrite").saveAsTable(table)
    Seq((n, seed)).toDF("n", "seed")
      .write.mode("overwrite").saveAsTable(s"${table}_meta")
  }

  def loadHllGateState(spark: org.apache.spark.sql.SparkSession,
      table: String, seed: String): (Long, Vector[Int]) = {
    val meta = spark.table(s"${table}_meta").head()
    require(meta.getString(1) == seed,
      s"gate state $table was written under seed " +
        s"'${meta.getString(1)}'; refusing to resume under '$seed'")
    val regs = new Array[Int](M)
    spark.table(table).collect().foreach { r =>
      regs(r.getInt(0)) = r.getInt(1)
    }
    (meta.getLong(0), regs.toVector)
  }

  /** STREAMING form: fold each micro-batch's epochs (ascending) into
    * the checkpointed 64-register vector, emit that epoch's prefix
    * estimate. State is EXACTLY 64 small ints + the prefix total —
    * bounded for any stream length and key cardinality; per-shard
    * register vectors merge by element-wise max upstream of the
    * single merge group (the e15 scale-out shape).
    *
    * `initial` (a loaded [[writeHllGateState]] artifact) seeds the
    * registers so a NEW query resumes warm; idempotent maxes make
    * seeded-then-stream ≡ streaming the concatenation
    * (spec-pinned). */
  def distinctEstimateStream(events: DataFrame, keyCol: String,
      batchCol: String, seed: String,
      initial: Option[(Long, Seq[Int])] = None): Dataset[CardinalityEstimate] = {
    initial.foreach { case (_, regs) =>
      require(regs.length == M,
        s"initial state carries ${regs.length} registers; need $M")
    }
    val spark = events.sparkSession
    import spark.implicits._

    def update(g: Int, rows: Iterator[(Long, String)],
        state: GroupState[HllState]): Iterator[CardinalityEstimate] = {
      val st = state.getOption.getOrElse(
        HllState(0L, Vector.fill(M)(0)))
      var n = st.n
      val regs = st.regs.toArray
      val out = scala.collection.mutable.ArrayBuffer[CardinalityEstimate]()
      rows.toArray.groupBy(_._1).toSeq.sortBy(_._1).foreach {
        case (b, evs) =>
          evs.foreach { case (_, k) =>
            val (bk, rank) = bucketRankJvm(seed, k)
            if (rank > regs(bk)) regs(bk) = rank
          }
          n += evs.length
          out += CardinalityEstimate(b, n,
            math.floor(estimate(regs) * 1e6).toLong)
      }
      state.update(HllState(n, regs.toVector))
      out.iterator
    }

    val grouped = events.select(col(batchCol).cast("long").as("batch"),
        col(keyCol).cast("string").as("key"))
      .as[(Long, String)]
      .groupByKey(_ => 0)
    initial match {
      case Some((n0, regs0)) =>
        val init = spark.createDataset(
          Seq((0, HllState(n0, regs0.toVector))))
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout, init)(update)
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(update)
    }
  }
}
