package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Winnowing fingerprints and duplicate-span pairs (d12). */
class WinnowSpec extends AnyFunSuite {
  import SparkTestSession._

  private val filler1 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val filler2 =
    "one two three four five six seven eight nine ten eleven twelve"
  // 40 chars — longer than the k+w-1 = 35-char winnowing guarantee
  private val shared =
    "the exact duplicated span that both share"

  test("documents sharing a >= 35-char run share a fingerprint (guarantee)") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$filler1 $shared $filler1"),
      (2L, s"$filler2 $shared $filler2"),
      // non-ASCII char exercises the code-point gram stepping
      (3L, "completely unrelated 填 prose nothing matching previous rows"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "a 40-char shared run must surface a shared fingerprint")
    val pairs = Dedup.winnowedDupPairs(docs, "doc_id", "text", minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "doc 3 shares tokens but no 35-char run with doc 1 or 2")
  }

  test("a document shorter than k chars yields exactly one fingerprint") {
    import spark.implicits._
    val docs = Seq((1L, "short text")).toDF("doc_id", "text")
    assert(Dedup.winnowedFingerprints(docs, "doc_id", "text").count() == 1L)
  }

  test("maxBucket excludes corpus-wide boilerplate from pair expansion") {
    import spark.implicits._
    // every doc shares the same long span: bucket of 4 > maxBucket = 3
    val docs = (1L to 4L)
      .map(i => (i, s"doc number $i padding words here $shared"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowedDupPairs(docs, "doc_id", "text",
      maxBucket = 3, minShared = 1L).collect()
    val open = Dedup.winnowedDupPairs(docs, "doc_id", "text",
      maxBucket = 1024, minShared = 1L).collect()
    assert(open.length == 6, "uncapped: all C(4,2) pairs via the shared span")
    assert(capped.length < open.length,
      "capping at 3 must drop the 4-doc boilerplate buckets")
  }

  test("incrementalWinnowNew drops batch docs sharing spans with the corpus") {
    import spark.implicits._
    val corpus = Seq(
      (10L, s"$filler1 $shared"),
      (11L, filler2)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"totally new framing around $shared yes"),
      (2L, "nothing here resembles the reference corpus rows"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalWinnowNew(batch, corpus, "doc_id", "text",
      minShared = 1L).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L),
      "doc 1 shares a 41-char run with the corpus and must be dropped")
  }

  test("indexed incremental check is result-identical to the recompute path") {
    import spark.implicits._
    val corpus = Seq(
      (10L, s"$filler1 $shared"),
      (11L, filler2)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"totally new framing around $shared yes"),
      (2L, s"prefix $filler2 suffix words"),
      (3L, "nothing here resembles the reference corpus rows"))
      .toDF("doc_id", "text")
    val direct = Dedup.incrementalWinnowNew(batch, corpus, "doc_id",
      "text", minShared = 1L).select("doc_id").as[Long].collect().toSet
    Dedup.writeWinnowIndex(corpus, "doc_id", "text", "winnow_spec_idx")
    val indexed = Dedup.incrementalWinnowIndexed(spark, "winnow_spec_idx",
      batch, "doc_id", "text", minShared = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(direct == indexed)
    assert(direct == Set(3L), "docs 1 and 2 embed corpus spans")
    graft.operators.Bucketing.dropTableAndLocation(spark, "winnow_spec_idx")
  }

  test("n_shared counts distinct shared fingerprints, id_a < id_b") {
    import spark.implicits._
    val docs = Seq(
      (7L, s"$filler1 $shared $filler2 $shared end marker words"),
      (5L, s"$filler2 $shared $filler1")).toDF("doc_id", "text")
    val rows = Dedup.winnowedDupPairs(docs, "doc_id", "text", minShared = 1L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 1L)
    }
  }

  test("exactDupSpans: the shared run is recovered exactly, nothing else marked") {
    import spark.implicits._
    // the shared run sits in four DISTINCT contexts (reusing
    // filler1/filler2 across docs would make the fillers duplicated
    // spans too). The TRUE common run is " $shared " — the separator
    // spaces on both sides are identical too — 43 chars, so exactly
    // the 43 - 35 + 1 = 9 fully-interior grams repeat; run-merge must
    // return ONE span per doc, at the space before the run, length 43
    val ctxA = "quick brown foxes jump over entirely lazy sleeping dogs"
    val ctxB = "pack my box with five dozen assorted liquor jugs today"
    val ctxC = "sphinx of black quartz judge my vow said the curator"
    val ctxD = "how vexingly quick daft zebras jump around the paddock"
    val docs = Seq(
      (1L, s"$ctxA $shared $ctxB"),
      (2L, s"$ctxC $shared $ctxD")).toDF("doc_id", "text")
    val spans = Dedup.exactDupSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(spans.toSeq == Seq(
      (1L, ctxA.length + 1L, 43L),
      (2L, ctxC.length + 1L, 43L)))
  }

  test("exactDupSpans: a repeat INSIDE one document is a duplicated span") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$shared $filler1 $shared"),
      (2L, filler2)).toDF("doc_id", "text")
    val spans = Dedup.exactDupSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    assert(spans.toSeq == Seq(
      (1L, 1L, 41L),
      (1L, shared.length + filler1.length + 3L, 41L)))
  }

  test("incrementalExactSpans: only corpus-present grams mark the batch; indexed path identical") {
    import spark.implicits._
    val ctxA = "quick brown foxes jump over entirely lazy sleeping dogs"
    val ctxB = "pack my box with five dozen assorted liquor jugs today"
    // the batch doc contains the corpus run " $shared " (43 chars)
    // and an internal repeat of its OWN phrase — the latter must NOT
    // mark (presence in the corpus is the rule, not self-repetition)
    val selfRep = "my own repeated phrase stays unmarked forever"
    val batch = Seq(
      (10L, s"$selfRep $shared $selfRep")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"$ctxA $shared $ctxB")).toDF("doc_id", "text")
    val spans = graft.operators.Dedup.incrementalExactSpans(
      batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq(
      (10L, selfRep.length + 1L, 43L)), spans.mkString(","))
    // persisted-index path is result-identical
    graft.operators.Dedup.writeGramIndex(corpus, "doc_id", "text",
      "spec_gram_idx")
    val viaIdx = graft.operators.Dedup.incrementalExactSpansIndexed(
      spark, "spec_gram_idx", batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIdx.toSeq == spans.toSeq)
  }

  test("stripExactSpans: exactly the shared run leaves, the rest stays byte-for-byte") {
    import spark.implicits._
    val ctxA = "quick brown foxes jump over entirely lazy sleeping dogs"
    val ctxB = "pack my box with five dozen assorted liquor jugs today"
    val ctxC = "sphinx of black quartz judge my vow said the curator"
    val ctxD = "how vexingly quick daft zebras jump around the paddock"
    val docs = Seq(
      (1L, s"$ctxA $shared $ctxB"),
      (2L, s"$ctxC $shared $ctxD"),
      (3L, "completely unique and untouched")).toDF("doc_id", "text")
    val got = graft.operators.Curation
      .stripExactSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // the marked span is " $shared " (43 chars, the separator spaces
    // are shared too) — stripping glues ctxA directly to ctxB
    assert(got(1L) == ((ctxA.length + shared.length + ctxB.length + 2L),
      (ctxA.length + ctxB.length).toLong, md5(ctxA + ctxB)), got(1L))
    assert(got(2L)._3 == md5(ctxC + ctxD))
    assert(got(3L)._2 == got(3L)._1 &&
      got(3L)._3 == md5("completely unique and untouched"))
  }

  test("keep-first spans: the canonical copy survives, every other strips") {
    import spark.implicits._
    val ctxA = "quick brown foxes jump over entirely lazy sleeping dogs"
    val ctxB = "pack my box with five dozen assorted liquor jugs today"
    val ctxC = "sphinx of black quartz judge my vow said the curator"
    val docs = Seq(
      (1L, s"$ctxA $shared $ctxB"),
      (2L, s"$ctxC $shared $ctxC"),
      (3L, "completely unique and untouched")).toDF("doc_id", "text")
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // doc 1 holds the smallest-(doc,pos) occurrence of the shared run
    // — it keeps it whole; doc 2's copy strips. x23 strips BOTH.
    val spans = graft.operators.Dedup
      .exactDupSpansKeepFirst(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(spans.forall(_._1 == 2L), spans.mkString(","))
    val got = graft.operators.Curation
      .stripExactSpansKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L)._2 == got(1L)._1 &&
      got(1L)._3 == md5(s"$ctxA $shared $ctxB"), got(1L))
    assert(got(2L)._2 < got(2L)._1, got(2L))
    assert(got(3L)._2 == got(3L)._1)
    // keep-first keeps at least as much as the strip-all form,
    // document for document
    val all = graft.operators.Curation
      .stripExactSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, kept, _)) =>
      assert(kept >= all(id), s"doc $id: $kept < ${all(id)}")
    }
  }

  test("exactDupSpans: identical short documents mark each other whole") {
    import spark.implicits._
    val docs = Seq((1L, "short text"), (2L, "short text"),
      (3L, "unique one")).toDF("doc_id", "text")
    val spans = Dedup.exactDupSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // the truncated-gram rule: one whole-text gram each, span_len is
    // the nominal minLen window
    assert(spans.toSeq == Seq((1L, 1L, 35L), (2L, 1L, 35L)))
  }
}
