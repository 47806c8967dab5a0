package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bpeMerges: hand-computed rounds, deterministic tie-break") {
    import spark.implicits._
    // corpus: "abab" x3, "ab" x2 → round 1 pairs:
    //   (a,b): 2*3 + 1*2 = 8; (b,a): 1*3 = 3  → merge (a,b)
    // round 2 over [ab,ab]x3, [ab]x2: (ab,ab): 3 → merge (ab,ab)
    val df = Seq("abab abab abab ab ab").toDF("text")
    val m = Bpe.bpeMerges(df, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("bpeMerges: leftmost-greedy non-overlapping application (l == r runs)") {
    import spark.implicits._
    // "aaaa": pairs (a,a) x3 → merge (a,a). Greedy leaves [aa][aa] in
    // "aaaa" and [aa][a] in "aaa", so round 2's top pair is (aa,aa)
    // with n=1 — an overlap-cheating application would see n=2+ or a
    // different pair entirely
    val df = Seq("aaaa aaa").toDF("text")
    val m = Bpe.bpeMerges(df, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 5L))) // 3 (aaaa) + 2 (aaa)
    assert(m(1) == ((2, "aa", "a", 1L)) || m(1) == ((2, "aa", "aa", 1L)),
      s"got ${m(1)}")
    // tie at n=1 between (aa,aa) [from aaaa] and (aa,a) [from aaa]:
    // lexicographic tie-break picks (aa,a)
    assert(m(1) == ((2, "aa", "a", 1L)))
  }

  test("bpeMerges: stops early when pairs run out") {
    import spark.implicits._
    val df = Seq("ab ab").toDF("text")
    val m = Bpe.bpeMerges(df, "text", 5).collect()
    // round 1 merges (a,b); afterwards every word is a single symbol
    assert(m.length == 1)
  }

  test("bpeEncode: applying the trained merges segments matching words") {
    import spark.implicits._
    val corpus = Seq("abab abab ab cd").toDF("text")
    val merges = Bpe.bpeMerges(corpus, "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.bpeEncode(Seq("abab ab cd e").toDF("text"), "text",
        merges)
      .select("tokens").collect()(0).getSeq[String](0)
    // merge 1 = (a,b), merge 2 = (ab,ab)
    assert(got == Seq("abab", "ab", "c", "d", "e"))
  }

  test("bpeEncode: sequential rank application == training fixpoint") {
    import spark.implicits._
    // every distinct word's encode must equal the symbol state the
    // trainer left it in after the same merges (the property the b2
    // oracle leans on)
    val corpus = Seq("banana bandana ban anna nab an").toDF("text")
    val merges = Bpe.bpeMerges(corpus, "text", 4)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // re-derive the trained word states by folding encode over the
    // distinct words (occurrence-local path)
    val enc = Bpe.bpeEncode(corpus, "text", merges)
      .select("tokens").collect()(0).getSeq[String](0)
    // re-encoding the concatenated token stream of single words must
    // reproduce itself (idempotence of a trained segmentation over
    // its own corpus)
    val again = Bpe.bpeEncode(Seq(enc.mkString(" ")).toDF("text"),
        "text", merges)
      .select("tokens").collect()(0).getSeq[String](0)
    assert(again.mkString("") == enc.mkString(""))
    assert(enc.nonEmpty && merges.size == 4)
  }

  test("tokenFrequencies == the definitional encode-then-count") {
    import spark.implicits._
    val corpus = Seq("abab abab ab cd", "abab dd cd cd", "e abab")
      .toDF("text").repartition(2)
    val merges = Bpe.bpeMerges(corpus, "text", 3)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val fast = Bpe.tokenFrequencies(corpus, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val slow = Bpe.bpeEncode(corpus, "text", merges)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("tokens")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fast == slow && fast.nonEmpty)
  }

  test("fertilityBy: in-vocab strata sit near 1, out-of-vocab strata fragment") {
    import spark.implicits._
    // train on the 'good' stratum's vocabulary only
    val docs = Seq(
      ("good", "abab abab abab abab"),
      ("good", "abab abab"),
      ("bad", "xyzw xyzw qrst")).toDF("lang", "text")
    val merges = Bpe.bpeMerges(
      docs.filter(org.apache.spark.sql.functions.col("lang") === "good"),
      "text", 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val f = Bpe.fertilityBy(docs, "text", "lang", merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // good: 'abab' collapses to one token (merges (a,b),(ab,ab)) →
    // fertility exactly 1.0 over 6 words
    assert(f("good") == ((6L, 6L, 1.0)), f.toString)
    // bad: 4-char words with no applicable merge → 4 tokens per word
    assert(f("bad")._3 == 4.0, f.toString)
  }

  test("bpeEncode: empty and whitespace-only text yields zero tokens") {
    import spark.implicits._
    val got = Bpe.bpeEncode(Seq("", "   ", "ab").toDF("text"), "text",
        Seq(("a", "b")))
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("tokens")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 1))
  }

  test("bpeEncode: native expression ≡ the declarative HOF fold") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import spark.implicits._
    // the fold's corner cases: run merges ("aaaa"→[aa][aa],
    // "aaa"→[aa][a]), merged-symbol chains, merges that only become
    // applicable mid-list, multi-codepoint symbols (astral plane),
    // tabs/newlines in the whitespace split, and null text
    val texts: Seq[String] = Seq(
      "aaaa aaa aa a", "abab ababab", "a b ab ba",
      "x\ty \n z  w", "  leading  and trailing   ",
      "café 😀😀 naïve",
      "", "   ", null)
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("ab", "ab"),
      ("aa", "aa"), ("😀", "😀"), ("c", "a"))
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), concat_ws("|", col("tokens")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = render(Bpe.bpeEncode(docs, "text", merges))
    val hof = render(Bpe.bpeEncodeHof(docs, "text", merges))
    assert(native == hof)
    // and on real corpus text with trained merges
    val corpus = graft.util.Tables.documents(spark,
      "/root/testdata/sf0.001").limit(40)
    val trained = Bpe.bpeMerges(corpus, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(render(Bpe.bpeEncode(corpus, "text", trained)) ==
      render(Bpe.bpeEncodeHof(corpus, "text", trained)))
  }

  test("bpeMergesBytes: hand-computed rounds over astral UTF-8 bytes") {
    import spark.implicits._
    // 😀 = F0 9F 98 80 (4 bytes, supplementary plane); words "😀a"×2,
    // "😀b"×1 share the emoji's 3 internal byte pairs at n=3 — every
    // round is a 3-way tie broken lexicographically on (l, r), so the
    // emoji reassembles inside-out: (98,80), then (9F,9880), then
    // (F0,9F9880), and round 4's top pair is the full emoji + 'a'
    val df = Seq((1L, "😀a 😀a 😀b"))
      .toDF("doc_id", "text")
    val m = Bpe.bpeMergesBytes(df, "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m.toSeq == Seq(
      (1, "98", "80", 3L), (2, "9F", "9880", 3L),
      (3, "F0", "9F9880", 3L), (4, "F09F9880", "61", 2L)))
  }

  test("bpeEncodeBytes: hex round-trip, total coverage by construction") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val corpus = Seq("😀a 😀a 😀b")
      .toDF("text")
    val merges = Bpe.bpeMergesBytes(corpus, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // unseen word "éx" (C3 A9 78): no trained merge applies, yet every
    // base symbol exists — byte BPE cannot meet an unknown unit, only
    // unknown sequences (char BPE would emit é as an OOV symbol here)
    val got = Bpe.bpeEncodeBytes(
        Seq("😀a éx").toDF("text"), "text", merges)
      .select(col("tokens")).collect()(0).getSeq[String](0)
    assert(got == Seq("F09F988061", "C3", "A9", "78"))
    // lossless: concatenated tokens unhex back to the original bytes
    val hexStream = got.mkString
    val bytes = hexStream.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8) == "😀aéx")
    // every token is whole hex pairs drawn from the 256-value alphabet
    assert(got.forall(t => t.length % 2 == 0 &&
      t.forall(c => c.isDigit || ('A' to 'F').contains(c))))
  }

  test("persisted models: loaded encode == in-memory encode, alphabet pinned by meta") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import spark.implicits._
    val corpus = Seq("😀a 😀a ab ab").toDF("text")
    val probe = Seq("😀a ab xy").toDF("text")
    def stream(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(concat_ws(" ", col("tokens")).as("s"))
        .collect().map(_.getString(0)).toSeq
    // byte model: the artifact's _meta (byte_level=true) must pick
    // the byte symbolization without the caller saying so
    val mb = Bpe.bpeMergesBytes(corpus, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.writeBpeModel(spark, mb, "spec_bpe_model", byteLevel = true)
    assert(stream(Bpe.bpeEncodeLoaded(probe, "text", "spec_bpe_model"))
      == stream(Bpe.bpeEncodeBytes(probe, "text", mb)))
    // char model round-trips under the same API
    val mc = Bpe.bpeMerges(corpus, "text", 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.writeBpeModel(spark, mc, "spec_bpe_model", byteLevel = false)
    assert(stream(Bpe.bpeEncodeLoaded(probe, "text", "spec_bpe_model"))
      == stream(Bpe.bpeEncode(probe, "text", mc)))
    // wordpiece vocab artifact
    val mw = Bpe.wordpieceMerges(corpus, "text", 2)
      .orderBy("rank").collect().map(_.getString(3)).toSeq
    val vocab = Bpe.wordpieceVocab(corpus, "text", mw)
    Bpe.writeWordPieceVocab(spark, vocab, "spec_wp_vocab")
    assert(stream(
      Bpe.wordpieceEncodeLoaded(corpus, "text", "spec_wp_vocab"))
      == stream(Bpe.wordpieceEncode(corpus, "text", vocab)))
  }

  test("wordpieceMerges: likelihood argmax beats raw count argmax") {
    import spark.implicits._
    // "ab" x3, "xy" x1 → units a=3, ##b=3, x=1, ##y=1.
    // pair (a,##b): n=3, score 3/9 = 0.333…; pair (x,##y): n=1,
    // score 1/1 = 1.0 — raw-count BPE would merge (a,##b) first;
    // WordPiece's likelihood score picks the rarer-but-perfectly-
    // coupled (x,##y). Round 2 then merges (a,##b).
    val df = Seq("ab ab ab xy").toDF("text")
    val m = Bpe.wordpieceMerges(df, "text", 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(m(0) == ((1, "x", "##y", "xy", 1L, 1L, 1L, 1000000000000L)))
    assert(m(1) == ((2, "a", "##b", "ab", 3L, 3L, 3L, 333333333333L)))
  }

  test("wordpieceMerges: continuation merges keep their ## prefix") {
    import spark.implicits._
    // "aab" x2 → [a, ##a, ##b]: pairs (a,##a) and (##a,##b) tie at
    // n=2, score 2/4; the (l, r) tie-break picks ##a < a, and the
    // merged token strips only the RIGHT's marker: ##a + ##b → ##ab
    val df = Seq("aab aab").toDF("text")
    val m = Bpe.wordpieceMerges(df, "text", 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(m(0) == ((1, "##a", "##b", "##ab")))
    // round 2: [a, ##ab] x2 → a + ##ab → aab (word-initial keeps
    // its bare spelling)
    assert(m(1) == ((2, "a", "##ab", "aab")))
  }

  test("wordpieceEncode: greedy longest-match-first, UNK on dead ends") {
    import spark.implicits._
    val vocab = Seq("a", "ab", "b", "##c", "##bc")
    def enc(w: String): Seq[String] =
      Bpe.wordpieceEncode(Seq(w).toDF("text"), "text", vocab)
        .select("tokens").collect()(0).getSeq[String](0)
    // longest init piece wins: ab beats a
    assert(enc("abc") == Seq("ab", "##c"))
    assert(enc("abbc") == Seq("ab", "##bc"))
    // no ##a continuation → the WHOLE word collapses to [UNK]
    assert(enc("ba") == Seq("[UNK]"))
    // ##c is continuation-only; c cannot start a word
    assert(enc("cab") == Seq("[UNK]"))
    // greedy is NOT Viterbi: "ab" consumes two chars, strands ##c?
    // no — here it matches; but under a vocab where the greedy
    // prefix strands the tail, WordPiece UNKs even though a
    // segmentation exists (the published BERT behavior)
    val vocab2 = Seq("a", "ab", "##bc")
    val got2 = Bpe.wordpieceEncode(Seq("abc").toDF("text"), "text",
        vocab2)
      .select("tokens").collect()(0).getSeq[String](0)
    assert(got2 == Seq("[UNK]")) // greedy "ab" + no ##c → dead end
  }

  test("wordpieceEncode: code-point matching (astral), training corpus never UNKs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // astral pieces: lengths count code points, not UTF-16 units
    val v = Seq("😀", "##😀", "##a")
    val got = Bpe.wordpieceEncode(
        Seq("😀😀a").toDF("text"), "text", v)
      .select("tokens").collect()(0).getSeq[String](0)
    assert(got == Seq("😀", "##😀", "##a"))
    // self-encoding: the b9 vocab covers every base symbol, so no
    // word of the training corpus can UNK, and stripping the ##
    // markers reassembles each word exactly
    val corpus = Seq("hello world", "hello there 😀")
      .toDF("text")
    val merged = Bpe.wordpieceMerges(corpus, "text", 3)
      .orderBy("rank").collect().map(_.getString(3)).toSeq
    val vocab = Bpe.wordpieceVocab(corpus, "text", merged)
    val toks = Bpe.wordpieceEncode(corpus, "text", vocab)
      .select(col("text"), col("tokens")).collect()
    toks.foreach { r =>
      val words = r.getString(0).trim.split("\\s+").filter(_.nonEmpty)
      val stream = r.getSeq[String](1)
      assert(!stream.contains("[UNK]"))
      // tokens reassemble the words in order
      val rebuilt = stream.foldLeft(List.empty[String]) {
        case (acc, t) if t.startsWith("##") && t.length > 2 =>
          acc.init :+ (acc.last + t.substring(2))
        case (acc, t) => acc :+ t
      }
      assert(rebuilt == words.toList, s"rebuilt $rebuilt vs $words")
    }
  }
}
