package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Ids
import graft.util.Tables
import graft.util.Tables.dec

/** Relational operator inventory (SURVEY.md §2.2–§2.7) expressed over the
  * driver's synthetic TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Every query is deterministically ordered and uses the exact-decimal
  * aggregation convention from [[graft.util.Tables]] so results hash-match
  * the oracle bit-for-bit.
  *
  * Operator IDs in the names refer to SURVEY.md §2 rows, which in turn cite
  * the reference (impresso-text-acquisition) file:line.
  */
object RelationalQueries {

  /** sum of money-like doubles, exact then back to double (see Tables). */
  private def sumMoney(c: org.apache.spark.sql.Column) =
    sum(dec(c)).cast("double")

  /** DuckDB Morton interleave of two pre-scaled 16-bit longs `sx`,
    * `sy` — the literal expansion of Layout.zvalue(16, sx, sy): bit b
    * of column i lands at interleaved position b*2+i. */
  private val zInterleaveSql: String =
    (for (b <- 0 until 16; (c, i) <- Seq(("sx", 0), ("sy", 1)))
      yield s"((($c >> $b) & 1) << ${b * 2 + i})").mkString(" | ")

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — alias include/exclude filter (detect.py:159-166)
    "f1_segment_filter" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // F2 — date-range filter (detect.py:12-66 _apply_datefilter)
    "f2_date_range" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // F3/J9 — incremental anti-join: skip already-imported work units
    // (generic_importer.py:240-249)
    "f3_incremental_anti" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // F4 — empty-issue filter as a semi-join: keep parents with children
    // (rebuilder.py:182-199)
    "f4_nonempty_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // J1 — issue ⋈ pages: parent joined to aggregated children
    // (rebuilders/helpers.py:136-173)
    "j1_order_lines" -> ((s, d) => {
      val lagg = Tables.lineitem(s, d).groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("n_lines"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      Tables.orders(s, d)
        .join(lagg, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"),
          col("n_lines"), col("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // J2 — ordered collect of child rows per parent
    // (paper_rebuilders.py:272-323 reconstruct_pages)
    "j2_collect_sorted" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(array_join(
          transform(array_sort(collect_list(col("l_linenumber"))),
            _.cast("string")), ",").as("line_nos"))
        .orderBy(col("l_orderkey"))
    }),

    // J6 — broadcast join with a small dimension table
    // (fedgaz/classes.py:175-240 metadata.tsv lookup)
    "j6_broadcast_dim" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // J8 — multi-hop dimension join (customer→nation→region), revenue per
    // region (olive/classes.py:397-440 image-info join analog)
    "j8_region_rollup" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sumMoney(col("o_totalprice")).as("total"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // A1/A2 — per-(alias,year) manifest statistics (core.py:406-415,
    // 649-653 counts_for_canonical_issue)
    "a1_yearly_stats" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"),
          sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("yr"))
    }),

    // A10 — multi-granularity totals in ONE pass: rollup emits
    // (yr, prio), (yr) and () grouping sets from a single scan +
    // shuffle — the manifest-stats shape at every granularity without
    // re-aggregating per level
    "a10_rollup_stats" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(year(col("o_orderdate")).as("yr"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("yr").asc_nulls_first, col("prio").asc_nulls_first)
    }),

    // A12 — CUBE: the full grouping-set lattice over (flag, status) —
    // a10's ROLLUP plus the cross sections. Same shuffle shape as a
    // plain groupBy (Spark expands grouping sets map-side before the
    // single exchange; the Expand multiplies rows ×4, the partial agg
    // collapses them again before the wire).
    "a12_cube_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .agg(count(lit(1)).as("n_lines"),
          sumMoney(col("l_extendedprice")).as("total"))
        .orderBy(col("flag").asc_nulls_first, col("status").asc_nulls_first)
    }),

    // A11 — exact quantiles: the distribution profile the corpus
    // curation thresholds (length cuts, quality bands) are tuned
    // against. Exact `percentile` is a per-group sort — fine when
    // groups are bounded (here: 3 return flags); unbounded-cardinality
    // profiling at 100 TB swaps in approx_percentile's t-digest sketch
    // (mergeable, bounded memory) at the price of oracle exactness
    "a11_quantiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity").cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("p25"),
          element_at(col("qs"), 2).as("p50"),
          element_at(col("qs"), 3).as("p75"))
        .orderBy(col("l_returnflag"))
    }),

    // J12 — salted shuffle join: identical semantics to the plain
    // orderkey join (the oracle IS the plain join), with the big
    // side's hottest key spread over 8 sub-partitions — the
    // known-skew tool when broadcast doesn't fit and AQE's runtime
    // thresholds can't be relied on (graft.operators.Skew)
    // The salt count comes from a sampled key histogram
    // (Skew.chooseSalts): TPC-H orderkeys are uniform, so the histogram
    // says "no hot key" and the join runs unsalted — salting uniform
    // data would only replicate the small side for nothing (the r5
    // bench outlier). The salted path itself is exercised and
    // result-equivalence-gated on a skewed frame in CurationSpec.
    "j12_salted_join" -> ((s, d) => {
      graft.operators.Skew.autoSaltedJoin(
        Tables.lineitem(s, d), Tables.orders(s, d),
        "l_orderkey", "o_orderkey",
        struct(col("l_orderkey"), col("l_linenumber")))
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_lines"),
          sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy(col("prio"))
    }),

    // J13 — Bloom-pruned join: the urgent-orders key set is selective
    // (~20%) but modeled as too big to broadcast; a Bloom filter of
    // its keys prunes lineitem DURING THE SCAN, before the join
    // shuffle. False positives die in the real join, so the result is
    // row-identical to the plain join — which is exactly what the
    // oracle runs (graft.operators.Bloom).
    "j13_bloom_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.Bloom.bloomJoin(
        Tables.lineitem(s, d), urgent, "l_orderkey", "o_orderkey")
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("n_lines"),
          sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy(col("yr"))
    }),

    // J14 — bucketed co-located join: both sides written bucketBy
    // their join key (the one-shuffle-at-write-time layout for
    // repeatedly-joined 100 TB facts), then joined with ZERO exchanges
    // — the executed-plan gate lives in BucketingSpec; this row proves
    // the bucketed path is RESULT-identical to the plain shuffle join
    // (which is exactly what the oracle runs).
    "j14_bucketed_join" -> ((s, d) => {
      // project BEFORE the write-time shuffle (guide §2.3): the join
      // aggregate reads only (key, prio) and (key, qty), so the
      // bucketed tables carry 2 columns instead of 9/16 — the write
      // exchange and the probe-time scans shrink ~8x, and the result
      // is column-for-column what the aggregate computed before
      graft.operators.Bucketing.writeBucketed(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        "j14_orders_b", "o_orderkey", nBuckets = 8)
      graft.operators.Bucketing.writeBucketed(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        "j14_lineitem_b", "l_orderkey", nBuckets = 8)
      graft.operators.Bucketing.bucketedJoin(s,
        "j14_lineitem_b", "j14_orders_b", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n_lines"),
          sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy(col("prio"))
    }),

    // J15 — bucketized range join: lineitem prices joined into ±1%
    // part-price windows. The naive BETWEEN theta-join plans a
    // nested-loop (O(n·m) — gated against in PlanAuditSpec); mapping
    // both sides to fixed-width buckets makes it an equi-join with an
    // exact post-filter, so the oracle is simply the plain BETWEEN
    // join (graft.operators.RangeJoin).
    "j15_range_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val p = Tables.part(s, d).select(col("p_partkey"),
        (col("p_retailprice") * 0.99).as("lo"),
        (col("p_retailprice") * 1.01).as("hi"))
      graft.operators.RangeJoin.bucketized(
        l, "l_extendedprice", p, "lo", "hi", width = 20.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_partkey"))
    }),

    // J16 — KEYED range join (the temporal-validity / SCD-2 shape:
    // equi-key AND value-in-range): lineitems priced within ±2% of
    // their OWN part's retail price. The equi-key rides the bucket id
    // in the shuffle key; the oracle is the plain two-predicate join.
    "j16_keyed_range_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_retailprice"),
        (col("p_retailprice") * 0.98).as("lo"),
        (col("p_retailprice") * 1.02).as("hi"))
      graft.operators.RangeJoin.bucketizedByKey(
        l, "l_extendedprice", p, "lo", "hi", width = 20.0,
        keys = Seq("l_partkey" -> "p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice"), col("p_retailprice"))
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    }),

    // L1 — Z-order layout: rows flow through zorderBy's range-cluster
    // + in-partition sort unchanged, and the emitted `z` column is the
    // Morton code itself, so the oracle re-derives the min/max scaling
    // AND the bit interleave — the arithmetic that decides what a
    // box-predicate scan PRUNES at 100 TB. File-level locality (the
    // point of the layout) is measured in LayoutSpec.
    "l1_zorder" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val cols = Seq("l_partkey", "l_suppkey")
      graft.operators.Layout.zorderBy(l, cols, nFiles = 8)
        .withColumn("z", graft.operators.Layout.scaledZ(l, cols, bits = 16))
        .select(col("l_orderkey"), col("l_linenumber"), col("z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // L2 — target-size compaction: coalesce to ~4 MB output files
    // after a selective filter. Row identity is the oracle's check;
    // the file-count bound is LayoutSpec's.
    "l2_compact" -> ((s, d) => {
      graft.operators.Layout.compactToSize(
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        targetBytes = 4L << 20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // L3 — MERGE-style upsert: a batch of modified + brand-new
    // customer rows replaces/extends the lake copy-on-write. The
    // oracle replays batch ∪ (lake anti batch) literally.
    "l3_upsert" -> ((s, d) => {
      val lake = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val batch = lake.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" (v2)")).as("c_name"),
          (dec(col("c_acctbal")) + lit(100).cast("decimal(18,2)"))
            .as("c_acctbal"))
        .unionByName(lake.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      graft.operators.Layout.upsert(lake, batch, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          col("c_acctbal").cast("double").as("acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // L4 — snapshot diff: reconcile two table versions by key into
    // added/removed/changed rows; unchanged rows (the mass of the
    // lake) never reach the output. Payload columns shuffle as md5
    // hashes, never as themselves.
    "l4_snapshot_diff" -> ((s, d) => {
      val before = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          dec(col("c_acctbal")).as("bal"))
      val base = before.filter(col("c_custkey") % 11 =!= 0) // removed
        .unionByName(before.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 2000000L).as("c_custkey"),
            col("c_name"), col("bal"))) // added
      val after = base.withColumn("bal",
        when(col("c_custkey") % 17 === 0,
          col("bal") + lit(1).cast("decimal(18,2)"))
          .otherwise(col("bal"))) // changed
      graft.operators.Layout.snapshotDiff(before, after,
        Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // E8 — streaming CDC apply replayed on batch (the e-family
    // promotion convention): three foreachBatch invocations of the
    // versioned exactly-once MERGE sink against a REAL on-disk lake —
    // seed-from-empty, a second merge on top, then a crash-replay of
    // the same batch id carrying poisoned data, which the _SUCCESS
    // protocol must SKIP. The row's output is the latest committed
    // version read back; the oracle replays the two real merges and
    // knows nothing of the poisoned replay — equality proves both the
    // merge chain and the idempotence cut.
    "e8_cdc_apply" -> ((s, d) => {
      import graft.streaming.ExactlyOnceSink
      val lakeDir = java.nio.file.Files
        .createTempDirectory("e8-cdc-lake").toString
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          dec(col("c_acctbal")).as("bal"))
      val seed = cust.filter(col("c_custkey") % 3 =!= 0)
      val sink = ExactlyOnceSink.upsertBatch(lakeDir,
        Seq("c_custkey"), seed) _
      val b0 = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" (v1)")).as("c_name"),
          (col("bal") + lit(50).cast("decimal(18,2)")).as("bal"))
      sink(b0, 0L)
      val b1 = cust.filter(col("c_custkey") % 11 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" (v2)")).as("c_name"),
          (col("bal") - lit(25).cast("decimal(18,2)")).as("bal"))
      sink(b1, 1L)
      // crash-replay of id 1 with DIFFERENT data: must be skipped —
      // if it applied, the " (v2) (v2)" names and zeroed balances
      // would break the oracle compare
      sink(b1.withColumn("bal", lit(0).cast("decimal(18,2)")), 1L)
      val (_, path) = ExactlyOnceSink.latestVersion(s, lakeDir).get
      s.read.parquet(path)
        .select(col("c_custkey"), col("c_name"),
          col("bal").cast("double").as("bal"))
        .orderBy(col("c_custkey"))
    }),

    // W8 — running totals: an unbounded-preceding frame is O(1) window
    // state per row (no buffering), partition-parallel by priority
    "w8_running_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("running", sum(col("n_orders")).over(
          Window.partitionBy(col("prio")).orderBy(col("yr"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy(col("prio"), col("yr"))
    }),

    // A2/A3 — pricing summary: multi-aggregate rollup with derived
    // averages (rebuilder.py:46 compute_stats_in_rebuilt_bag analog)
    "a2_pricing_summary" -> ((s, d) => {
      val one = lit(1).cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) *
            (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A6 — sorted distinct child keys per parent
    // (rebuilders/helpers.py:355-358 sorted(set(pp)))
    "a6_distinct_sorted" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(array_join(
          transform(array_sort(array_distinct(collect_list(col("l_partkey")))),
            _.cast("string")), ",").as("part_keys"))
        .orderBy(col("l_orderkey"))
    }),

    // A7 — bounding-box style min/max aggregation
    // (swissinfo/helpers.py:118-131 compute_agg_coords)
    "a7_minmax_bounds" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          to_date(min(col("ts"))).as("first_day"),
          to_date(max(col("ts"))).as("last_day"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // A8 — majority vote / mode with deterministic tie-break
    // (ina/classes.py:234-249 Counter(langs).most_common)
    "a8_mode_per_user" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type").asc)
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"), col("n"))
        .orderBy(col("user_id"))
    }),

    // A9 — boolean consensus over a group (paper_rebuilders.py:315-316
    // sum(cc)/len(cc) == 1.0)
    "a9_bool_consensus" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(bool_and(col("l_returnflag") === "N").as("all_n"),
          bool_or(col("l_linestatus") === "F").as("any_f"))
        .orderBy(col("l_orderkey"))
    }),

    // W1 — reading order: row_number per partition in a total order
    // (utils.py:139-158 get_reading_order)
    "w1_reading_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("ro"))
        .orderBy(col("o_custkey"), col("ro"))
    }),

    // W5 — largest-area part: arg-max with deterministic tie-break
    // (rero/classes.py:481-506)
    "w5_argmax_line" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"))
    }),

    // W6 — top-k with deterministic tie-break (test_rebuilder.py:92 limit)
    "w6_topk_customers" -> ((s, d) => {
      Tables.customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(10)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // U1 — union distinct (lux/classes.py:558-571 CI list union)
    "u1_union_nations" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nk"))
    }),

    // U2 — except / difference (lux/helpers.py:120 remove_section_cis)
    "u2_except_nations" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy(col("nk"))
    }),

    // U3 — intersect (utils.py:104-112 id set verification)
    "u3_intersect_nations" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy(col("nk"))
    }),

    // U4/J10 — dropDuplicates before a side effect (core.py:434-440)
    "u4_dedup_count" -> ((s, d) => {
      Tables.lineitem(s, d)
        .dropDuplicates("l_partkey", "l_suppkey")
        .agg(count(lit(1)).as("n_distinct_pairs"))
    }),

    // C1 — canonical ID minting (docs/architecture.rst:23-46)
    "c1_id_mint" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("issue_id",
          Ids.issueId(lit("GDL"), col("o_orderdate"), lit("a")))
      o.select(col("o_orderkey"), col("issue_id"),
        Ids.contentItemId(col("issue_id"), col("o_orderkey") % 10000)
          .as("ci_id"))
        .orderBy(col("o_orderkey"))
    }),

    // C2 — canonical ID parsing back out (rebuilders/helpers.py:194)
    "c2_id_parse" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("issue_id",
          Ids.issueId(lit("GDL"), col("o_orderdate"), lit("a")))
        .withColumn("ci_id",
          Ids.contentItemId(col("issue_id"), col("o_orderkey") % 10000))
      o.select(col("o_orderkey"),
        Ids.aliasOf(col("ci_id")).as("alias"),
        Ids.dateOf(col("ci_id")).as("issue_date"),
        Ids.itemNumberOf(col("ci_id")).as("item_n"))
        .orderBy(col("o_orderkey"))
    }),

    // C3 — date building/formatting (rebuilders/helpers.py:194-195)
    "c3_dates" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        last_day(to_date(col("o_orderdate"))).as("eom"))
        .orderBy(col("o_orderkey"))
    })
  )

  val sql: Map[String, String] = Map(
    "f1_segment_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
        |ORDER BY c_custkey""".stripMargin,

    "f2_date_range" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_orderkey""".stripMargin,

    "f3_incremental_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "f4_nonempty_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "j1_order_lines" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |       n_lines, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, count(*) AS n_lines,
        |             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey) la
        |  ON o_orderkey = la.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "j2_collect_sorted" ->
      """SELECT l_orderkey,
        |       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_nos
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "j6_broadcast_dim" ->
      """SELECT p_brand,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "j8_region_rollup" ->
      """SELECT r_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "a1_yearly_stats" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a10_rollup_stats" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  o_orderpriority AS prio, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP(CAST(year(o_orderdate) AS INT), o_orderpriority)
        |ORDER BY yr ASC NULLS FIRST, prio ASC NULLS FIRST""".stripMargin,

    "a12_cube_stats" ->
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  count(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin,

    "a11_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS p25,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS p50,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "j12_salted_join" ->
      """SELECT o_orderpriority AS prio, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j13_bloom_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // j14: the oracle IS the plain shuffle join — bucketing must be
    // invisible in the result
    "j14_bucketed_join" ->
      """SELECT o_orderpriority AS prio, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // j15: the oracle IS the naive theta-join — bucketization must be
    // invisible in the result (CAST pins the factors to DOUBLE; a bare
    // 0.99 literal is DECIMAL in DuckDB)
    "j15_range_join" ->
      """SELECT p_partkey, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part
        |  ON l_extendedprice >= p_retailprice * CAST(0.99 AS DOUBLE)
        | AND l_extendedprice <= p_retailprice * CAST(1.01 AS DOUBLE)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j16_keyed_range_join" ->
      """SELECT l_orderkey, l_partkey, l_extendedprice, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | AND l_extendedprice >= p_retailprice * CAST(0.98 AS DOUBLE)
        | AND l_extendedprice <= p_retailprice * CAST(1.02 AS DOUBLE)
        |ORDER BY l_orderkey, l_partkey, l_extendedprice""".stripMargin,

    // l1: re-derive the scaling (truncating double->long cast = TRUNC
    // then BIGINT cast) and the 2x16-bit Morton interleave
    "l1_zorder" ->
      s"""WITH bounds AS (
         |  SELECT min(CAST(l_partkey AS DOUBLE)) AS mnp,
         |         max(CAST(l_partkey AS DOUBLE)) AS mxp,
         |         min(CAST(l_suppkey AS DOUBLE)) AS mns,
         |         max(CAST(l_suppkey AS DOUBLE)) AS mxs
         |  FROM lineitem),
         |sc AS (
         |  SELECT l_orderkey, l_linenumber,
         |    LEAST(65535, GREATEST(0, CAST(TRUNC(
         |      (CAST(l_partkey AS DOUBLE) - mnp) / (mxp - mnp) * 65535)
         |      AS BIGINT))) AS sx,
         |    LEAST(65535, GREATEST(0, CAST(TRUNC(
         |      (CAST(l_suppkey AS DOUBLE) - mns) / (mxs - mns) * 65535)
         |      AS BIGINT))) AS sy
         |  FROM lineitem, bounds)
         |SELECT l_orderkey, l_linenumber,
         |  CAST($zInterleaveSql AS BIGINT) AS z
         |FROM sc ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // l2: compaction must be row-invisible
    "l2_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    // l3: batch ∪ (lake anti batch), replayed literally
    "l3_upsert" ->
      """WITH lake AS (
        |  SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |batch AS (
        |  SELECT c_custkey, c_name || ' (v2)' AS c_name,
        |    bal + CAST(100 AS DECIMAL(18,2)) AS bal
        |  FROM lake WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, bal
        |  FROM lake WHERE c_custkey % 97 = 0)
        |SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS acctbal
        |FROM batch
        |UNION ALL
        |SELECT l.c_custkey, l.c_name, CAST(l.bal AS DOUBLE) AS acctbal
        |FROM lake l
        |WHERE l.c_custkey NOT IN (SELECT c_custkey FROM batch)
        |ORDER BY c_custkey""".stripMargin,

    // l4: change classification by direct value comparison — the
    // engine-side md5 is an internal equality proxy, not part of the
    // contract
    "l4_snapshot_diff" ->
      """WITH before AS (
        |  SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |aft AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 17 = 0
        |         THEN bal + CAST(1 AS DECIMAL(18,2)) ELSE bal END AS bal
        |  FROM (
        |    SELECT c_custkey, c_name, bal FROM before
        |    WHERE c_custkey % 11 <> 0
        |    UNION ALL
        |    SELECT c_custkey + 2000000, c_name, bal FROM before
        |    WHERE c_custkey % 13 = 0))
        |SELECT COALESCE(b.c_custkey, a.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'added'
        |       WHEN a.c_custkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM before b FULL JOIN aft a ON b.c_custkey = a.c_custkey
        |WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
        |   OR b.c_name <> a.c_name OR b.bal <> a.bal
        |ORDER BY 1""".stripMargin,

    // e8: replay the two committed merges (v0 = seed MERGE b0,
    // v1 = v0 MERGE b1); the skipped poisoned replay never happened
    "e8_cdc_apply" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |seed AS (SELECT * FROM cust WHERE c_custkey % 3 <> 0),
        |b0 AS (
        |  SELECT c_custkey, c_name || ' (v1)' AS c_name,
        |    bal + CAST(50 AS DECIMAL(18,2)) AS bal
        |  FROM cust WHERE c_custkey % 7 = 0),
        |v0 AS (
        |  SELECT * FROM b0
        |  UNION ALL
        |  SELECT * FROM seed
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM b0)),
        |b1 AS (
        |  SELECT c_custkey, c_name || ' (v2)' AS c_name,
        |    bal - CAST(25 AS DECIMAL(18,2)) AS bal
        |  FROM cust WHERE c_custkey % 11 = 0),
        |v1 AS (
        |  SELECT * FROM b1
        |  UNION ALL
        |  SELECT * FROM v0
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM b1))
        |SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS bal
        |FROM v1 ORDER BY c_custkey""".stripMargin,

    "w8_running_total" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT prio, yr, n_orders,
        |  CAST(SUM(n_orders) OVER (PARTITION BY prio ORDER BY yr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running
        |FROM g ORDER BY prio, yr""".stripMargin,

    "a2_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))) *
        |           (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a6_distinct_sorted" ->
      """SELECT l_orderkey,
        |       string_agg(CAST(pk AS VARCHAR), ',' ORDER BY pk) AS part_keys
        |FROM (SELECT DISTINCT l_orderkey, l_partkey AS pk FROM lineitem)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "a7_minmax_bounds" ->
      """SELECT event_type, min(value) AS min_v, max(value) AS max_v,
        |       CAST(min(ts) AS DATE) AS first_day,
        |       CAST(max(ts) AS DATE) AS last_day,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a8_mode_per_user" ->
      """SELECT user_id, event_type AS top_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY count(*) DESC, event_type) = 1
        |ORDER BY user_id""".stripMargin,

    "a9_bool_consensus" ->
      """SELECT l_orderkey, bool_and(l_returnflag = 'N') AS all_n,
        |       bool_or(l_linestatus = 'F') AS any_f
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "w1_reading_order" ->
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey) AS ro
        |FROM orders ORDER BY o_custkey, ro""".stripMargin,

    "w5_argmax_line" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber ASC) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "w6_topk_customers" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""".stripMargin,

    "u1_union_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "u2_except_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "u3_intersect_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "u4_dedup_count" ->
      """SELECT count(*) AS n_distinct_pairs
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)""".stripMargin,

    "c1_id_mint" ->
      """SELECT o_orderkey,
        |  'GDL-' || strftime(o_orderdate, '%Y-%m-%d') || '-a' AS issue_id,
        |  'GDL-' || strftime(o_orderdate, '%Y-%m-%d') || '-a-i' ||
        |    lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0') AS ci_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c2_id_parse" ->
      """WITH ids AS (
        |  SELECT o_orderkey,
        |    'GDL-' || strftime(o_orderdate, '%Y-%m-%d') || '-a-i' ||
        |      lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0') AS ci_id
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_extract(ci_id, '^([^-]+)-', 1) AS alias,
        |  CAST(regexp_extract(ci_id, '^[^-]+-(\d{4}-\d{2}-\d{2})-', 1) AS DATE) AS issue_date,
        |  CAST(regexp_extract(ci_id, '-i(\d+)$', 1) AS INT) AS item_n
        |FROM ids ORDER BY o_orderkey""".stripMargin,

    "c3_dates" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
