package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity}

class ScaleOperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact dedup groups identical texts under the min id") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("id", "text")
    val out = Dedup.exact(df, "id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("LSH recovers planted near-duplicates on sf0.001") {
    val pairs = SparkEntry.queries("d3_lsh_neardup_pairs")(spark, sf).collect()
    assert(pairs.nonEmpty, "expected planted near-dups at jaccard>=0.8")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.8))
    // the known top pair from data inspection must be found
    assert(pairs.exists(r =>
      r.getAs[Long]("id_a") == 474L && r.getAs[Long]("id_b") == 498L))
  }

  test("LSH bucket cap drops mass-duplicate buckets instead of going quadratic") {
    import spark.implicits._
    // 10k EXACT duplicates: they collide in every band, so an uncapped
    // expansion would emit ~4 * C(10k, 2) = 200M pairs from single
    // tasks. With the cap the buckets are dropped (exact-dedup-first is
    // the documented contract for recovering those pairs); the drop is
    // accounted exactly by the lshBucketOverflow audit and observable
    // as the lsh_bucket_overflow metric — the latter only when a stage
    // survives AQE's empty-relation folding (all buckets overflow here,
    // so the observe path is gated with AQE off; see the
    // boundedBucketPairs scaladoc for the delivery contract).
    @volatile var observed: Map[String, org.apache.spark.sql.Row] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.observedMetrics.nonEmpty) observed ++= qe.observedMetrics
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = (1 to 10000).map(i =>
        (i.toLong, "same mass duplicated body of text for every document"))
        .toDF("doc_id", "text")
      val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text", maxBucket = 100)
      assert(pairs.count() == 0L, "overflowing buckets must be dropped")
      // the guaranteed audit: exact overflow accounting as a result row
      val audit = Dedup.lshBucketOverflow(docs, "doc_id", "text",
        maxBucket = 100).collect()(0)
      assert(audit.getAs[Long]("overflow_buckets") == 4L, audit.toString)
      assert(audit.getAs[Long]("overflow_docs") == 40000L, audit.toString)
      // the zero-cost observed metric, on its documented delivery terms.
      // The AQE-on count above may already have delivered a best-effort
      // [0,0] row under the same metric name (the scaladoc'd degradation
      // when AQE folds the all-overflow stage away), so clear the
      // listener's map first and wait for a NON-ZERO row — key presence
      // alone can be won by the stale zero delivery under full-suite
      // load.
      observed = Map.empty
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try assert(Dedup.lshNearDupPairs(docs, "doc_id", "text",
        maxBucket = 100).count() == 0L)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val deadline = System.nanoTime() + 10_000_000_000L
      def delivered: Option[org.apache.spark.sql.Row] =
        observed.get("lsh_bucket_overflow")
          .filter(_.getAs[Long]("overflow_buckets") != 0L)
      while (delivered.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = delivered.getOrElse(observed("lsh_bucket_overflow"))
      assert(m.getAs[Long]("overflow_buckets") == 4L, m.toString)
      assert(m.getAs[Long]("overflow_docs") == 40000L, m.toString)
    } finally spark.listenerManager.unregister(listener)
  }

  test("ngram Jaccard blocks on min shingle hash and verifies exactly") {
    import spark.implicits._
    // two near-identical docs (one token changed late in the text share
    // their min shingle with high probability), one unrelated doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "completely different words everywhere nothing shared here at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // 8 shingles each; only the final window covers the changed token,
    // so 7 shared of 9 distinct → jaccard 7/9
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 7.0 / 9) < 1e-9)
    // mass-duplicate corpus: the single min-hash block overflows and is
    // dropped, never expanded quadratically
    val mass = (1 to 5000).map(i => (i.toLong, "same text for everyone"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(mass, "doc_id", "text",
      maxBucket = 100).count() == 0L)
  }

  test("simhash of near-identical docs is hamming-close, distinct docs far") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different words nothing shared here at all today")
    ).toDF("id", "text")
    val h = df.select(col("id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
  }

  test("cosine of identical vectors is 1.0; topK ranks are dense") {
    import spark.implicits._
    val v = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cos = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.vec_id") === 1 && col("b.vec_id") === 2)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .collect()(0).getDouble(0)
    assert(cos == 1.0)
    val topk = Similarity.bruteForceTopK(v.filter(col("vec_id") === 1), v,
      "vec_id", "embedding", 2).collect()
    assert(topk.map(_.getAs[Int]("rank")).sorted.sameElements(Array(1, 2)))
    assert(topk.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("n_id") == 2L)
  }

  test("ANN candidates are a subset of brute-force ordering semantics") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 4)
    val ann = Similarity.annTopK(q, e, "vec_id", "embedding", 5, 8)
    // every ANN neighbor shares the query's sign bucket by construction
    val withBuckets = ann.join(
      e.select(col("vec_id").as("q_id"),
        Similarity.signBucket(col("embedding"), 8).as("qb")), "q_id")
      .join(e.select(col("vec_id").as("n_id"),
        Similarity.signBucket(col("embedding"), 8).as("nb")), "n_id")
    assert(withBuckets.filter(col("qb") =!= col("nb")).count() == 0)
  }

  test("embedding LSH pairs with bits=1 reproduce brute force exactly") {
    // bits = 1 is the exhaustive degeneration of the banded blocking
    // (a pair is missed only when all 64 hyperplane projections
    // disagree — probability < 1e-25 at the threshold), mirroring
    // s3's nprobe = nlist ≡ exact gate
    val e = graft.util.Tables.embeddings(spark, sf)
    val blocked = Similarity.lshNearDupPairs(
      e, "vec_id", "embedding", bands = 64, bits = 1, threshold = 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(blocked == exact)
  }

  test("embedding LSH pairs at auto-sized bands/bits keep high recall") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val (bands, bits) = Similarity.rhpGeometry(e.count(), threshold = 0.3)
    val blocked = Similarity.lshNearDupPairs(
      e, "vec_id", "embedding", bands = bands, bits = bits, threshold = 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), "blocking must never invent pairs")
    val recall = (blocked & exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall = $recall at geometry ${bands}x$bits")
  }

  test("auto-sized recall holds at sf0.1-scale n where slice keying collapsed") {
    // THE scale-recall gate (round-7 verdict #1): at n=2000 the
    // auto-sized geometry is 42 bands x 6 bits = 252 projections —
    // more than the 64 embedding dims, impossible under the old
    // coordinate-slice keying (bands*bits <= dim capped it at 10
    // bands, expected recall 0.42). Seeded hyperplanes hold the
    // formula floor 0.9 regardless of n; gate measured recall vs
    // brute force at the d6 threshold.
    val e = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val (bands, bits) = Similarity.rhpGeometry(n, threshold = 0.35)
    assert(bands * bits > 64,
      s"geometry ${bands}x$bits must exceed the dim budget to prove the point")
    val blocked = Similarity.lshNearDupPairs(
      e, "vec_id", "embedding", bands = bands, bits = bits, threshold = 0.35)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.35)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), "blocking must never invent pairs")
    val recall = (blocked & exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall = $recall at geometry ${bands}x$bits, n=$n")
  }

  test("hyperplane band keys: deterministic, packed, null-poisoning") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumns
    val planes = Similarity.hyperplanes(2, 3, 4, "spec-seed")
    // deterministic: same seed derives the same matrix
    assert(planes.map(_.toSeq).toSeq ==
      Similarity.hyperplanes(2, 3, 4, "spec-seed").map(_.toSeq).toSeq)
    assert(planes.forall(_.forall(x => x == 1.0f || x == -1.0f)))
    def keysOf(v: Seq[Float]): Option[Seq[Long]] = {
      val df = Seq(Tuple1(v)).toDF("v")
      val r = df.select(GraftColumns.column(graft.functions.RhpBandKeys(
        GraftColumns.expression(col("v")), planes, 3)).as("k")).head()
      if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
    }
    // key bit j of band b is the sign of planes(b*bits+j) . v
    val v = Seq(0.5f, -1.5f, 2.0f, -0.25f)
    val expected = (0 until 2).map { b =>
      (0 until 3).foldLeft(0L) { (key, j) =>
        val dot = planes(b * 3 + j).zip(v).map {
          case (p, x) => p.toDouble * x.toDouble }.sum
        if (dot >= 0) key | (1L << j) else key
      }
    }
    assert(keysOf(v).get == expected)
    // a vector whose length differs from the planes poisons to null
    // (drops out of banding) instead of keying on a partial projection
    assert(keysOf(Seq(1.0f, 2.0f)).isEmpty)
  }

  test("multi-band hyperplane ANN recovers most exact top-5 neighbors") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val ann = pairs(Similarity.rhpAnnTopK(q, e, "vec_id", "embedding", 5,
      bands = 16, bits = 4))
    assert(ann.forall { case (qId, nId) => qId < 16 && qId != nId })
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"top-5 recall = $recall")
  }

  test("SQ8 codes are in-range and reconstruction stays within half a step") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val (mins, maxs) = Similarity.sq8Bounds(e, "embedding")
    assert(mins.length == 64 && mins.zip(maxs).forall { case (m, x) => m <= x })
    val steps = maxs.zip(mins).map { case (x, m) => (x - m) / 255.0 }
    val rows = e.select(col("embedding"),
      Similarity.sq8Encode(col("embedding"), mins, maxs).as("codes"),
      Similarity.sq8Reconstruct(
        Similarity.sq8Encode(col("embedding"), mins, maxs), mins, maxs)
        .as("recon"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val codes = r.getSeq[Byte](1)
      val rec = r.getSeq[Double](2)
      assert(codes.length == 64 && rec.length == 64)
      // tinyint range is the storage claim; half-step is the ADC
      // error bound (plus double-rounding slack)
      for (i <- 0 until 64)
        assert(math.abs(v(i) - rec(i)) <= steps(i) / 2 + 1e-9,
          s"dim $i: v=${v(i)} rec=${rec(i)} step=${steps(i)}")
    }
  }

  test("SQ8 ADC top-k recalls nearly all exact neighbors (value-only error)") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val sq8 = pairs(Similarity.sq8TopK(q, e, "vec_id", "embedding", 5))
    // SQ8 scores every candidate — loss only where quantized scores
    // cross between true neighbors, so recall should beat any LSH path
    val recall = (sq8 & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"top-5 recall = $recall")
    // plan claims: broadcast join (corpus never shuffles for the pair
    // scan) and no Window (bounded-heap top-k)
    val plan = Similarity.sq8TopK(q, e, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("Window"), "top-k must not be a window sort")
  }

  test("PQ code words are m bytes from the codebook; malformed vectors poison to null") {
    import spark.implicits._
    val e = graft.util.Tables.embeddings(spark, sf)
    val cb = Similarity.pqCodebooksFirst(e, "vec_id", "embedding", 8, 16)
    assert(cb.length == 8 && cb.forall(_.length == 16) &&
      cb.forall(_.forall(_.length == 8)))
    val rows = e.select(
      Similarity.pqEncode(col("embedding"), cb).as("codes"),
      Similarity.pqReconstruct(
        Similarity.pqEncode(col("embedding"), cb), cb).as("recon"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](0)
      val rec = r.getSeq[Double](1)
      assert(codes.length == 8 && rec.length == 64)
      // every code addresses a real centroid (−128-shifted index < ksub)
      assert(codes.forall(c => c >= -128 && c < -128 + 16))
      // each reconstructed slice IS the addressed centroid, exactly
      for (j <- 0 until 8) {
        val cent = cb(j)(codes(j) + 128)
        for (d <- 0 until 8)
          assert(rec(j * 8 + d) == cent(d).toDouble,
            s"subspace $j dim $d not a codebook row")
      }
    }
    // a wrong-length vector must null-poison, not encode partially
    val bad = Seq(Array.fill(63)(0.5f)).toDF("v")
      .select(Similarity.pqEncode(col("v"), cb).as("codes")).first()
    assert(bad.isNullAt(0), "length-mismatched vector must encode to null")
    // >256 centroids cannot be addressed by a byte code — refused
    val tooBig = Array.fill(1)(Array.fill(257)(Array.fill(64)(0f)))
    intercept[IllegalArgumentException] {
      graft.functions.PqCodes(
        org.apache.spark.sql.GraftColumns.expression(col("v")), tooBig)
    }
  }

  test("PQ with ksub = corpus size degenerates to exact brute force") {
    // every vector's own slice is distance 0 in each subspace, so the
    // code word addresses itself and reconstruction is exact — the PQ
    // analog of IVF's nprobe = nlist and LSH's bits = 1 proofs. Capped
    // at 200 vectors: byte codes address at most 256 centroids.
    val e = graft.util.Tables.embeddings(spark, sf)
    val sub = e.filter(col("vec_id") < 200)
    val q = e.filter(col("vec_id") < 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = rows(Similarity.bruteForceTopK(q, sub, "vec_id", "embedding", 5))
    val degen = rows(Similarity.pqTopK(q, sub, "vec_id", "embedding", 5,
      m = 8, ksub = 200))
    assert(degen == exact)
  }

  test("Trained PQ codebooks cut reconstruction MSE below the untrained quantizer") {
    val e = graft.util.Tables.embeddings(spark, sf)
    def mse(cb: Array[Array[Array[Float]]]): Double = {
      val rec = Similarity.pqReconstruct(
        Similarity.pqEncode(col("embedding"), cb), cb)
      e.select(avg(
        Similarity.dot(col("embedding"), col("embedding"))
          - lit(2.0) * Similarity.dot(col("embedding"), rec)
          + Similarity.dot(rec, rec))).first().getDouble(0)
    }
    val first = mse(Similarity.pqCodebooksFirst(e, "vec_id", "embedding", 8, 16))
    val trained = mse(Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 16, 3))
    // k-means minimizes exactly this objective per subspace; measured
    // 0.75 -> 0.56 at sf0.001. Top-k RECALL is not gated here: on this
    // unstructured synthetic corpus PQ's value error scrambles the
    // tightly-packed ranking (~0.2-0.3 recall@5) — SQ8 is the
    // value-accurate ADC path, PQ the 32x-compression one.
    assert(trained < first,
      s"trained MSE $trained should beat untrained $first")
    // plan claims, same as SQ8: broadcast pair scan, bounded-heap top-k
    val q = e.filter(col("vec_id") < 16)
    val plan = Similarity.pqTopKWith(q, e, "vec_id", "embedding", 5,
      Similarity.pqCodebooksFirst(e, "vec_id", "embedding", 8, 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("Window"), "top-k must not be a window sort")
  }

  test("IVF-PQ: saturated codebook + probe-all degenerates to exact brute force") {
    // chained degenerate proof: nprobe = nlist makes coverage exact,
    // ksub = corpus size (iters = 1: every residual is its own initial
    // centroid at distance 0) makes reconstruction exact — so the full
    // IVF-PQ pipeline must reproduce bruteForceTopK including ranks
    val e = graft.util.Tables.embeddings(spark, sf)
    val sub = e.filter(col("vec_id") < 200)
    val q = e.filter(col("vec_id") < 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cents = Similarity.pqCodebooksFirst(sub, "vec_id", "embedding", 1, 4)(0)
    val exact = rows(Similarity.bruteForceTopK(q, sub, "vec_id", "embedding", 5))
    val degen = rows(Similarity.ivfPqTopK(q, sub, "vec_id", "embedding", 5,
      cents, nprobe = 4, m = 8, ksub = 200, iters = 1))
    assert(degen == exact)
  }

  test("IVF-PQ index is codes-not-vectors; residual PQ beats global PQ at equal code size") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 16)
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 16, 3)
    val (index, codebooks) =
      Similarity.ivfPqIndex(e, "vec_id", "embedding", cents, 8, 16, 3)
    // the persistable artifact: int cell + m tinyint codes per vector
    // (~12 bytes), never the float vector
    val schema = index.schema
    assert(schema("cell").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false))
    assert(!schema.fieldNames.exists(_.contains("vec")),
      "index must not carry raw vectors")
    assert(index.count() == e.count())

    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val ivfpq = pairs(Similarity.ivfPqSearch(q, index, "vec_id", "embedding",
      5, cents, codebooks, nprobe = 16))
    val globalPq = pairs(Similarity.pqTopKWith(q, e, "vec_id", "embedding", 5,
      Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 16, 3)))
    val rIvfPq = (ivfpq & exact).size.toDouble / exact.size
    val rGlobal = (globalPq & exact).size.toDouble / exact.size
    // residuals concentrate near zero once the cell absorbs position,
    // so the same 8-byte budget quantizes finer (0.39 vs 0.20 measured
    // at sf0.001, probe-all so coverage is equal on both sides)
    assert(rIvfPq >= rGlobal,
      s"residual PQ recall $rIvfPq < global PQ recall $rGlobal")

    // plan: cell-keyed broadcast join, bounded-heap top-k
    val plan = Similarity.ivfPqSearch(q, index, "vec_id", "embedding",
      5, cents, codebooks, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("Window"), "top-k must not be a window sort")
  }

  test("IVF-PQ index round-trips through parquet: loaded search equals in-memory search") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 16)
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8, 2)
    val (index, codebooks) =
      Similarity.ivfPqIndex(e, "vec_id", "embedding", cents, 8, 16, 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = rows(Similarity.ivfPqSearch(q, index, "vec_id", "embedding",
      5, cents, codebooks, nprobe = 4))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.saveIvfPqIndex(index, cents, codebooks, dir)
    val (index2, cents2, codebooks2) = Similarity.loadIvfPqIndex(spark, dir)
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(codebooks2.map(_.map(_.toSeq).toSeq).toSeq ==
      codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val after = rows(Similarity.ivfPqSearch(q, index2, "vec_id", "embedding",
      5, cents2, codebooks2, nprobe = 4))
    assert(after == before)
  }

  test("lshBucketStats forecasts the in-bucket pair expansion exactly for planted dups") {
    import spark.implicits._
    // 20 identical texts collide in every band; 30 distinct fillers
    val rows = (0 until 20).map(i => (i.toLong, "the same exact document text here")) ++
      (0 until 30).map(i => ((100 + i).toLong,
        s"filler document number $i with its own unique words $i"))
    val df = rows.toDF("id", "text")
    val stats = Dedup.lshBucketStats(df, "id", "text").collect()(0)
    assert(stats.getAs[Long]("n_buckets") > 0)
    // the planted cluster dominates: its bucket shows up at full size
    // in every band
    assert(stats.getAs[Long]("max_bucket") >= 20L)
    // pair_expansion >= bands * C(20,2) from the planted cluster alone
    assert(stats.getAs[Long]("pair_expansion") >= 4L * (20 * 19 / 2))
    // p99 sees the mass-duplicate bucket while p50 stays small — the
    // drift signature the scaladoc tells operators to watch for
    val ps = stats.getSeq[Long](stats.fieldIndex("size_p50_p90_p99"))
    assert(ps.length == 3 && ps(2) >= ps(0))
  }

  test("sq8 rerank emits exact-cosine scores and never recalls worse than raw ADC") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val adc = pairs(Similarity.sq8TopK(q, e, "vec_id", "embedding", 5))
    val rr = Similarity.sq8TopKRerank(q, e, "vec_id", "embedding", 5, 3)
    // reranked scores are bit-identical to full-precision cosine —
    // quantization error is gone from every returned value
    val withExact = rr
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), "n_id")
      .withColumn("cexp", Similarity.cosine(col("qv"), col("nv")))
    assert(withExact.filter(col("cos") =!= col("cexp")).count() == 0)
    // recall recovery: the reranked top-k agrees with brute force at
    // least as often as the quantized ranking it started from
    val rrOverlap = (pairs(rr) & exact).size
    val adcOverlap = (adc & exact).size
    assert(rrOverlap >= adcOverlap, s"rerank $rrOverlap < adc $adcOverlap")
    // plan: the candidate fetch is a broadcast join against the corpus
    // scan — the corpus must never sort-merge-shuffle for it
    val plan = rr.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "candidate fetch must broadcast")
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for rerank")
  }

  test("exactRerank over an all-pairs candidate set reproduces brute force exactly") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val all = q.select(col("vec_id").as("q_id"))
      .crossJoin(e.select(col("vec_id").as("n_id")))
      .filter(col("q_id") =!= col("n_id"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val expected = rows(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val got = rows(Similarity.exactRerank(all, q, e, "vec_id", "embedding", 5))
    assert(got == expected)
  }

  test("IVF with k-means-trained centroids: probe-all is exact, few probes recall well") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val trained = Similarity.kmeansCentroids(e, "vec_id", "embedding",
      k = 16, iters = 2)
    assert(trained.length == 16 && trained.forall(_.length == 64))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    // nprobe = nlist probes every cell — must reproduce brute force
    // exactly whatever the codebook (the s3 gate, now for trained cells)
    val all = pairs(Similarity.ivfTopKWith(q, e, "vec_id", "embedding", 5,
      trained, nprobe = 16))
    assert(all == exact)
    // few probes against trained cells keep useful recall
    val few = pairs(Similarity.ivfTopKWith(q, e, "vec_id", "embedding", 5,
      trained, nprobe = 4))
    val recall = (few & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"trained-cell recall at nprobe=4: $recall")
  }

  test("minhash banding mirrors the recall guard and auto-sizing") {
    import spark.implicits._
    // 1 band x 16 rows at jaccard 0.8: expected recall 0.8^16 = 0.028 —
    // must be refused at plan time like the embedding LSH
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairs(docs, "doc_id", "text",
        k = 3, numHashes = 16, bands = 1, threshold = 0.8)
    }
    assert(ex.getMessage.contains("expected recall"))
    // auto-sizing picks the sharpest banding that holds the target
    val (b, r) = Dedup.minhashGeometry(0.8, targetRecall = 0.9)
    assert(Dedup.minhashExpectedRecall(b, r, 0.8) >= 0.9)
    // and prefers more rows per band over cheaper-but-mushier bandings
    assert(r > 1, s"geometry ${b}x$r must not degenerate to 1-row bands")
    // the d3 default (4x4 at 0.8) stays above the guard: floor 0.88
    assert(Dedup.minhashExpectedRecall(4, 4, 0.8) > 0.85)
  }

  test("n-aware minhash geometry grows rows with log n and holds recall") {
    // sf0.01 scale reproduces the geometry the d3 oracle embeds
    assert(Dedup.minhashGeometry(500L, 0.8) == (5, 4))
    // rows grow with log n (bounding background-similarity colliders
    // at ~targetBucket/doc/band), bands re-grow to hold recall 0.9
    val ns = Seq(500L, 500000L, 50000000L, 5000000000L)
    val geos = ns.map(Dedup.minhashGeometry(_, 0.8))
    assert(geos.map(_._2) == geos.map(_._2).sorted, s"rows not monotone: $geos")
    assert(geos.last._2 > geos.head._2, s"rows never grew: $geos")
    geos.foreach { case (b, r) =>
      assert(Dedup.minhashExpectedRecall(b, r, 0.8) >= 0.9,
        s"geometry ${b}x$r breaks the recall floor") }
    // background pairs (jaccard 0.1) stay bounded: n * 0.1^rows <= 32
    // once the sizing term dominates the minRows floor
    ns.zip(geos).drop(1).foreach { case (n, (_, r)) =>
      assert(n * math.pow(0.1, r) <= 32.0 + 1e-9,
        s"n=$n rows=$r leaves ${n * math.pow(0.1, r)} colliders/doc") }
    // sized path returns the same pairs as the explicit-geometry path
    val docs = graft.util.Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val sized = pairSet(Dedup.lshNearDupPairsSized(
      docs, "doc_id", "text", k = 3, threshold = 0.8))
    val (b0, r0) = Dedup.minhashGeometry(docs.count(), 0.8)
    val explicit = pairSet(Dedup.lshNearDupPairs(docs, "doc_id", "text",
      k = 3, numHashes = b0 * r0, bands = b0, threshold = 0.8))
    assert(sized == explicit && sized.nonEmpty)
  }

  test("LSH refuses geometries whose expected recall floor is below 0.5") {
    // the recall guard: a caller asking for 4 bands x 14 bits at
    // threshold 0.35 (expected recall ~0.4%) must find out at plan
    // time, not ship a blocking that misses 99.6% of true pairs
    val e = graft.util.Tables.embeddings(spark, sf)
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(
        e, "vec_id", "embedding", bands = 4, bits = 14, threshold = 0.35)
    }
    assert(ex.getMessage.contains("expected recall"))
  }

  test("dot of length-mismatched or null-element vectors is null (HOF parity)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f), Seq(3.0f))).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1), "mismatched lengths must yield null")
    // a malformed vector sorts last under cos DESC instead of scoring
    // a silently-partial dot (nulls last in descending order)
    val mixed = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f))).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(
      mixed.filter(col("vec_id") === 1), mixed, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(topk.head.getAs[Long]("n_id") == 2L)
  }

  test("IVF probes recover most of the true neighbors (recall vs exact)") {
    val e = graft.util.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing 4 of 16 cells keeps useful recall on this data
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall")
    // widening the probe set can only add candidates: nprobe = nlist
    // degenerates to exact brute-force
    val full = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 16)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
  }

  test("kmeans recovers well-separated clusters and keeps empty cells' centroids") {
    import spark.implicits._
    // two tight clusters on opposite axes; ids 0,1 (one per cluster)
    // seed the init so both cells survive
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f)
                 else Array(0f, 0f, 1f, 0f)
      (i.toLong, base.map(_ + 0.01f * (i / 2)).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val sums = Similarity.kmeansSums(df, "vec_id", "embedding",
      k = 2, iters = 3, scale = 1e6)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // both cells keep their 10 members; centroid dominant dim matches
    assert(sums((0, 0))._2 == 10L && sums((1, 0))._2 == 10L)
    assert(sums((0, 0))._1 > sums((0, 2))._1, "cell 0 should point at dim 0")
    assert(sums((1, 2))._1 > sums((1, 0))._1, "cell 1 should point at dim 2")

    // k=3 with only two distinct directions: init centroids are vectors
    // 0,1,2; vector 2 = cluster-0 direction, so after round 1 some cell
    // may go empty — the operator must not crash and must return k or
    // fewer cells with all 20 vectors accounted for
    val sums3 = Similarity.kmeansSums(df, "vec_id", "embedding",
      k = 3, iters = 3, scale = 1e6)
    val byCell = sums3.filter(col("dim") === 0)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(byCell.values.sum == 20L)
    assert(byCell.keys.forall(c => c >= 0 && c < 3))
  }

  test("fingerprint is invariant to token order and punctuation") {
    import spark.implicits._
    val df = Seq((1L, "Hello, world! foo"), (2L, "foo WORLD hello"),
      (3L, "other text")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("langId picks the language with the most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze und der Vogel"),
      (3L, "zzz qqq www")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("quality score stays in [0,1] on real docs") {
    val q = SparkEntry.queries("t2_quality_score")(spark, sf)
    val bad = q.filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("persisted RHP index: drops banded cosine-close batch vectors, index side pre-bucketed") {
    import spark.implicits._
    import graft.operators.Similarity
    def unit(dim: Int, axis: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == axis) 1f else 0f)
    val lake = Seq((100L, unit(64, 0)), (101L, unit(64, 5)))
      .toDF("vec_id", "embedding")
    // batch: an exact copy of a lake vector (all bands collide,
    // cos 1 -> dropped) and an orthogonal new one (cos 0 -> kept
    // regardless of band collisions)
    val batch = Seq((0L, unit(64, 0)), (1L, unit(64, 9)))
      .toDF("vec_id", "embedding")
    Similarity.writeRhpIndex(lake, "vec_id", "embedding",
      "spec_rhp_idx", bands = 16, bits = 4)
    val out = Similarity.incrementalEmbedNewIndexed(spark,
      "spec_rhp_idx", batch, "vec_id", "embedding", threshold = 0.9)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L))
    // both persisted tables scan bucketed (the write-time shuffle is
    // the one the lake ever pays for keys AND vectors); the candidate
    // distinct + vector joins add exchanges, but every one of them
    // carries ids/keys — never band-multiplied vectors
    val p = out.queryExecution.executedPlan.toString
    assert("Bucketed: true".r.findAllIn(p).length >= 2,
      s"key index and vector table must both scan bucketed:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
    // pre-stats index (written before <table>_stats existed): the
    // probe degrades gracefully by re-deriving bucket populations
    // from the index instead of failing table-not-found
    spark.sql("DROP TABLE spec_rhp_idx_stats")
    val noStats = Similarity.incrementalEmbedNewIndexed(spark,
      "spec_rhp_idx", batch, "vec_id", "embedding", threshold = 0.9)
    assert(noStats.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("persisted RHP index: count-first bucket cap excludes mass-duplicate buckets (over-keep, audited)") {
    import spark.implicits._
    import graft.operators.Similarity
    def unit(dim: Int, axis: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == axis) 1f else 0f)
    // a lake that SKIPPED exact dedup: 300 identical copies of one
    // vector (they collide in EVERY band -> one 300-row bucket per
    // band) plus one genuinely distinct vector
    val lake = ((0 until 300).map(i => (100L + i, unit(64, 0))) :+
      (900L, unit(64, 5))).toDF("vec_id", "embedding")
    val batch = Seq(
      (0L, unit(64, 0)), // near-dup of the mass-duplicated vector
      (1L, unit(64, 5)), // near-dup of the singleton lake vector
      (2L, unit(64, 9))) // new
      .toDF("vec_id", "embedding")
    Similarity.writeRhpIndex(lake, "vec_id", "embedding",
      "spec_rhp_cap_idx", bands = 16, bits = 4)
    // capped probe: the duplicate-mass buckets (n = 300 > 100) are
    // excluded, so batch 0's only collisions vanish and it SURVIVES
    // (the documented over-keep); batch 1 still collides with the
    // singleton's small buckets and is dropped
    val capped = Similarity.incrementalEmbedNewIndexed(spark,
      "spec_rhp_cap_idx", batch, "vec_id", "embedding",
      threshold = 0.9, maxBucket = 100)
    assert(capped.collect().map(_.getLong(0)).toSet == Set(0L, 2L))
    // default cap (4096) is far above the bucket sizes -> inert: the
    // mass near-dup IS dropped, matching the uncapped semantics
    val inert = Similarity.incrementalEmbedNewIndexed(spark,
      "spec_rhp_cap_idx", batch, "vec_id", "embedding", threshold = 0.9)
    assert(inert.collect().map(_.getLong(0)).toSet == Set(2L))
    // the exact audit sees the exclusion: every band contributes one
    // overflow bucket of the 300 duplicates (301 in a band where the
    // singleton happens to share the key) at maxBucket = 100, none
    // at the default 4096
    val audit = Similarity.rhpBucketStats(spark, "spec_rhp_cap_idx",
      maxBucket = 100).collect()(0)
    assert(audit.getAs[Long]("overflow_buckets") == 16L)
    val rows = audit.getAs[Long]("overflow_rows")
    assert(rows >= 16L * 300 && rows <= 16L * 301, s"overflow_rows=$rows")
    assert(audit.getAs[Long]("max_bucket") >= 300L)
    val quiet = Similarity.rhpBucketStats(spark, "spec_rhp_cap_idx")
      .collect()(0)
    assert(quiet.getAs[Long]("overflow_buckets") == 0L)
  }
}
