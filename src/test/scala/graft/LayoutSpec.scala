package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("zvalue interleaves bits: unit inputs land at their interleaved positions") {
    import spark.implicits._
    val df = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L)).toDF("x", "y")
    val got = df.select(Layout.zvalue(2, col("x"), col("y"))).as[Long].collect()
    // x bit b -> position 2b, y bit b -> position 2b+1:
    // (1,0)->1, (0,1)->2, (1,1)->3, (2,3)->{x:bit1->pos2, y:bits0,1->pos1,3}=2+8+4=14
    assert(got.toSeq == Seq(1L, 2L, 3L, 14L))
  }

  test("zvalue matches a bit-interleave model on random inputs, monotone per dim") {
    import spark.implicits._
    def model(bits: Int, xs: Seq[Long]): Long =
      (for (b <- 0 until bits; (x, i) <- xs.zipWithIndex)
        yield ((x >> b) & 1L) << (b * xs.length + i)).foldLeft(0L)(_ | _)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(16, col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == model(16, Seq(x, y)), s"($x,$y)")
    }
    // interleave is monotone within a dimension at fixed other dims —
    // the property range pruning on z relies on
    val ys = rows.map(_._2).distinct.take(5)
    for (y <- ys) {
      val inDim = got.filter(_._2 == y).sortBy(_._1)
      assert(inDim.map(_._3).sliding(2).forall(
        p => p.length < 2 || p(0) <= p(1)), s"non-monotone at y=$y")
    }
  }

  test("z-order keeps locality in EVERY interleaved dimension; a sort only in one") {
    // sf0.01 (15k orders): big enough that 16 files discriminate
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val n = orders.count()
    val nFiles = 16
    val r = orders.agg(
      min("o_custkey"), max("o_custkey"),
      min("o_totalprice"), max("o_totalprice")).first()
    val (cMin, cMax) = (r.getLong(0), r.getLong(1))
    val (pMin, pMax) = (r.getDouble(2), r.getDouble(3))
    // the discriminating predicate constrains ONLY the dimension the
    // baseline layout is NOT sorted by
    val custkeyDecile = col("o_custkey") <= cMin + (cMax - cMin) / 10
    val box2d = custkeyDecile &&
      col("o_totalprice") <= pMin + (pMax - pMin) / 10

    def layout(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory("graft_layout")
        .toString
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    def filesTouched(back: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.Column): Int =
      back.filter(p).select(input_file_name()).distinct().count().toInt

    val z = layout(
      Layout.zorderBy(orders, Seq("o_custkey", "o_totalprice"), nFiles))
    val priceSorted = layout(
      orders.repartitionByRange(nFiles, col("o_totalprice"))
        .sortWithinPartitions(col("o_totalprice")))
    assert(z.count() == n && priceSorted.count() == n,
      "layout must preserve rows")

    // measured: 2-D box — z 1 file, price-sorted 2; custkey decile —
    // z 4 files, price-sorted ALL 16 (custkey is independent of
    // price, so the sorted layout has zero locality for it). The file
    // counts are what min/max skipping converts into pruned I/O.
    assert(filesTouched(z, box2d) <= 2)
    val zCust = filesTouched(z, custkeyDecile)
    val sCust = filesTouched(priceSorted, custkeyDecile)
    assert(zCust <= nFiles / 2,
      s"z-order custkey decile touched $zCust of $nFiles files")
    assert(sCust >= nFiles - 2,
      s"baseline should spread over ~all files, touched $sCust")
    assert(zCust < sCust / 2,
      s"z-order ($zCust) must beat the orthogonal sort ($sCust) clearly")
  }

  test("compactToSize sizes partition count from bytes; coalesce path is shuffle-free") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val bytes = orders.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val target = bytes / 3 + 1
    val compacted = Layout.compactToSize(orders, target)
    assert(compacted.rdd.getNumPartitions <= 3)
    val shuffles = collect(compacted.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, "coalesce compaction must not shuffle")
    val even = Layout.compactToSize(orders, target, even = true)
    assert(even.rdd.getNumPartitions == math.ceil(bytes.toDouble / target).toInt)
    assert(even.count() == orders.count())
  }

  test("upsert replaces matched keys, inserts new ones, leaves the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lake = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq((2L, "B!"), (9L, "new")).toDF("k", "v")
    val out = Layout.upsert(lake, batch, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B!", 3L -> "c", 9L -> "new"))
    // an empty batch is the identity
    val id = Layout.upsert(lake, batch.filter(col("k") < 0), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(id == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // the batch key set probes the lake as a broadcast anti-join
    val p = Layout.upsert(lake, batch, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    import spark.implicits._
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val after = Seq((1L, "a", 10), (2L, "b", 21), (4L, "d", 40))
      .toDF("k", "v", "n")
    val out = Layout.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // column-boundary shifts in the concatenated payload still differ
    // (separated hash): ("ab", "c") vs ("a", "bc")
    val x = Seq((1L, "ab", "c")).toDF("k", "p", "q")
    val y = Seq((1L, "a", "bc")).toDF("k", "p", "q")
    val d = Layout.snapshotDiff(x, y, Seq("k")).collect()
    assert(d.length == 1 && d(0).getString(1) == "changed")
    // NULL-involved changes are real changes (concat_ws silently
    // skips nulls; the per-column v/n marker must catch these):
    // (x, NULL) -> (NULL, x) and NULL -> ''
    val n1 = Seq((1L, Some("x"), Option.empty[String]))
      .toDF("k", "p", "q")
    val n2 = Seq((1L, Option.empty[String], Some("x")))
      .toDF("k", "p", "q")
    val dn = Layout.snapshotDiff(n1, n2, Seq("k")).collect()
    assert(dn.length == 1 && dn(0).getString(1) == "changed",
      "null-position swap must be a change")
    val e1 = Seq((1L, Option.empty[String])).toDF("k", "p")
    val e2 = Seq((1L, Some(""))).toDF("k", "p")
    assert(Layout.snapshotDiff(e1, e2, Seq("k")).collect().length == 1,
      "NULL -> '' must be a change")
    // and an identical null row is NOT a change
    assert(Layout.snapshotDiff(e1, e1, Seq("k")).collect().isEmpty)
  }

  test("packSequences: next-fit fold matches a hand example incl. overflow rules") {
    import spark.implicits._
    // shard 0: 40+50 fill pack 1 exactly (90), 30 opens pack 2, the
    // oversized 120 gets its OWN pack 3 (fill 120 > 90 flags it),
    // then 10+0+80 fill pack 4 (zero-length docs take a position but
    // no budget); shard 1 is independent (its own pack_seq space)
    val docs = Seq(
      (0L, 10L, 40L), (0L, 11L, 50L), (0L, 12L, 30L), (0L, 13L, 120L),
      (0L, 14L, 10L), (0L, 15L, 0L), (0L, 16L, 80L),
      (1L, 20L, 90L), (1L, 21L, 1L),
      // shard 2: a ZERO-LENGTH doc occupies pack 1 at fill 0; the
      // oversized successor must still take its own pack (occupancy,
      // not fill, guards the new-pack rule), and the next doc opens
      // pack 3
      (2L, 30L, 0L), (2L, 31L, 120L), (2L, 32L, 5L)
    ).toDF("shard", "doc_id", "len")
    val got = Layout.packSequences(docs, "doc_id", "len", "shard", 90L)
      .orderBy("shard", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 10L, 1L, 1L, 40L), (0L, 11L, 1L, 2L, 90L),
      (0L, 12L, 2L, 1L, 30L), (0L, 13L, 3L, 1L, 120L),
      (0L, 14L, 4L, 1L, 10L), (0L, 15L, 4L, 2L, 10L),
      (0L, 16L, 4L, 3L, 90L),
      (1L, 20L, 1L, 1L, 90L), (1L, 21L, 2L, 1L, 1L),
      (2L, 30L, 1L, 1L, 0L), (2L, 31L, 2L, 1L, 120L),
      (2L, 32L, 3L, 1L, 5L)))
  }

  test("packSequences: deterministic under any input partitioning; every doc exactly once") {
    import spark.implicits._
    // lens 0..149 straddle the 128 budget so the invariant below
    // exercises zero-length docs AND oversized own-pack docs
    val docs = spark.range(0, 500)
      .select(col("id").as("doc_id"), (col("id") % 7).as("shard"),
        (pmod(col("id") * 37 + 11, lit(150))).as("len"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Layout.packSequences(df, "doc_id", "len", "shard", 128L)
        .orderBy("shard", "id")
        .collect().map(_.toSeq).toSeq
    val a = run(docs.repartition(32))
    val b = run(docs.repartition(1))
    val c = run(docs.orderBy(col("doc_id").desc).repartition(5))
    assert(a == b && b == c, "fold must not depend on input layout")
    assert(a.length == 500 &&
      a.map(_(1)).distinct.length == 500, "every doc exactly once")
    // no pack exceeds budget unless it is a single oversized doc
    val byPack = a.groupBy(r => (r(0), r(3)))
    byPack.foreach { case ((_, _), rows) =>
      val fill = rows.map(_(2).asInstanceOf[Long]).sum
      assert(fill <= 128L || rows.length == 1,
        s"overfull multi-doc pack: $rows")
    }
    // pos_in_pack is contiguous from 1 within each pack
    byPack.foreach { case (_, rows) =>
      assert(rows.map(_(4).asInstanceOf[Long]).sorted ==
        (1L to rows.length).toSeq)
    }
  }

  test("packPayloads: payloads join members in order; packs == packSequences exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, 10L, 40L, "A"), (0L, 11L, 50L, "B"), (0L, 12L, 30L, "C"),
      (0L, 13L, 120L, "D"), (0L, 14L, 10L, "E"), (0L, 15L, 0L, "F"),
      (0L, 16L, 80L, "G"), (1L, 20L, 90L, "H"), (1L, 21L, 1L, "I")
    ).toDF("shard", "doc_id", "len", "text")
    val got = Layout.packPayloads(docs, "doc_id", "len", "text",
        "shard", 90L)
      .orderBy("shard", "pack_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // same boundaries as the packSequences hand example; the open
    // trailing pack of each shard flushes at iterator end
    assert(got.toSeq == Seq(
      (0L, 1L, 2L, 90L, "A\nB"), (0L, 2L, 1L, 30L, "C"),
      (0L, 3L, 1L, 120L, "D"), (0L, 4L, 3L, 90L, "E\nF\nG"),
      (1L, 1L, 1L, 90L, "H"), (1L, 2L, 1L, 1L, "I")))
    // one rule, two emitters: pack keys and sizes agree with
    // packSequences on a bigger randomized frame
    val big = spark.range(0, 500)
      .select(col("id").as("doc_id"), (col("id") % 7).as("shard"),
        pmod(col("id") * 37 + 11, lit(150)).as("len"),
        concat(lit("d"), col("id")).as("text"))
    val assign = Layout.packSequences(big, "doc_id", "len", "shard",
        128L)
      .groupBy("shard", "pack_seq")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("n_tokens"))
      .orderBy("shard", "pack_seq").collect().map(_.toSeq).toSeq
    val pay = Layout.packPayloads(big, "doc_id", "len", "text",
        "shard", 128L)
      .select(col("shard"), col("pack_seq"),
        col("n_docs").cast("long"), col("n_tokens"))
      .orderBy("shard", "pack_seq").collect().map(_.toSeq).toSeq
    assert(pay == assign)
  }

  test("packSequencesIncremental: batch packs continue the base numbering, base untouched") {
    import spark.implicits._
    val base = Layout.packSequences(
      Seq((0L, 1L, 60L), (0L, 2L, 60L), (1L, 3L, 10L))
        .toDF("shard", "doc_id", "len"),
      "doc_id", "len", "shard", 90L)
    // shard 0 base ends at pack 2 (60+60 splits), shard 1 at pack 1
    val incr = Layout.packSequencesIncremental(
      Seq((0L, 10L, 50L), (0L, 11L, 50L), (1L, 12L, 5L),
        (2L, 13L, 7L))
        .toDF("shard", "doc_id", "len"),
      "doc_id", "len", "shard", 90L, base)
      .orderBy("shard", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    assert(incr.toSeq == Seq(
      (0L, 10L, 3L, 1L), (0L, 11L, 4L, 1L), // continue after base's 2
      (1L, 12L, 2L, 1L),                    // after base's 1
      (2L, 13L, 1L, 1L)))                   // shard new to the base
    // the union's pack keys never collide: every (shard, pack_seq,
    // pos_in_pack) identifies one doc across both runs
    val union = base.select("shard", "pack_seq", "pos_in_pack")
      .union(Layout.packSequencesIncremental(
        Seq((0L, 10L, 50L), (0L, 11L, 50L), (1L, 12L, 5L),
          (2L, 13L, 7L)).toDF("shard", "doc_id", "len"),
        "doc_id", "len", "shard", 90L, base)
        .select("shard", "pack_seq", "pos_in_pack"))
    assert(union.distinct().count() == union.count())
  }

  test("packSequences: one shuffle (the shard repartition), nothing after the fold") {
    import spark.implicits._
    val docs = spark.range(0, 100)
      .select(col("id").as("doc_id"), (col("id") % 4).as("shard"),
        lit(10L).as("len"))
    val plan = Layout.packSequences(docs, "doc_id", "len", "shard", 64L)
      .queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }
    assert(shuffles.length == 1,
      s"expected exactly the shard exchange, got ${shuffles.length}")
    intercept[IllegalArgumentException] {
      Layout.packSequences(docs, "doc_id", "len", "shard", 0L)
    }
  }
}
