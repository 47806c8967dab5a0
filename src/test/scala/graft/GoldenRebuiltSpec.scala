package graft

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Canonical._
import graft.text.PaperRebuild

/** Round-trip verification against the reference's golden REBUILT
  * output (data/rebuilt_out/CL/CL-1882 — produced by the reference's
  * own rebuilder; its canonical inputs are NOT in-repo, so the goldens
  * cannot be regenerated, but they can be inverted): reconstruct each
  * content item's canonical tokens from the golden token spans
  * (tx = ft slice), partition them into lines/paras/regions with the
  * recorded lb/pb/rb break offsets (hyphen pairs from their span
  * lengths; empty regions from surplus rb occurrences), re-run OUR
  * fold, and require byte-identical fulltext, spans and break lists.
  * This checks the fold AND the whitespace rules against text the
  * actual reference emitted, not just hand-computed fixtures.
  */
class GoldenRebuiltSpec extends AnyFunSuite {

  private val goldenDir =
    "/root/reference/text_preparation/data/rebuilt_out/CL/CL-1882"
  private val mapper = new ObjectMapper()

  private case class GTok(c: Seq[Int], s: Int, l: Int,
      hy1: Boolean, hy2: Boolean)

  private def seqInt(n: JsonNode): Seq[Int] =
    (0 until n.size).map(n.get(_).asInt)

  /** hy1 text is not recoverable from ft (the fold drops it); a filler
    * of the right length ending in '-' reproduces the span + boundary
    * arithmetic, and the default whitespace rules never read the
    * dropped text. hy2 tokens get their nf from the fulltext slice. */
  private def tokOf(t: GTok, ft: String): CToken =
    if (t.hy1) CToken(t.c, Some(("~" * math.max(t.l + 1, 0)) + "-"),
      None, Some(true), None, None)
    else if (t.hy2) CToken(t.c, Some(ft.substring(t.s, t.s + t.l)),
      None, None, Some(ft.substring(t.s, t.s + t.l)), None)
    else CToken(t.c, Some(ft.substring(t.s, t.s + t.l)),
      None, None, None, None)

  test("golden CL-1882 rebuilt docs round-trip through the fold") {
    var attempted = 0
    var passed = 0
    var skipped = 0
    val dummy = Seq(0, 0, 1, 1)
    val files = new java.io.File(goldenDir).listFiles.sortBy(_.getName)
    for (f <- files; line <- scala.io.Source.fromFile(f, "utf-8")
        .getLines() if line.trim.nonEmpty) {
      val doc = mapper.readTree(line)
      val ft = Option(doc.get("ft")).map(_.asText).getOrElse("")
      val ppreb = doc.get("ppreb")
      val lb = Option(doc.get("lb")).map(seqInt).getOrElse(Nil)
      val pb = Option(doc.get("pb")).map(seqInt).getOrElse(Nil)
      val rb = Option(doc.get("rb")).map(seqInt).getOrElse(Nil)
      val lg = Option(doc.get("lg")).filterNot(_.isNull).map(_.asText)

      if (ppreb == null || ft.isEmpty) { skipped += 1 }
      else {
        attempted += 1
        val lbSet = lb.toSet
        val pbSet = pb.toSet
        val rbSet = rb.toSet
        var reconstructable = true

        // phase A: per page, partition tokens into non-empty region
        // groups (lines close at the recorded break offsets — a
        // trailing hy token records its START, paper_rebuilders.py:89)
        val pageGroups = mutable.ArrayBuffer.empty[Seq[Seq[Seq[Seq[GTok]]]]]
        for (p <- 0 until ppreb.size if reconstructable) {
          val ts = ppreb.get(p).get("t")
          val toks = (0 until ts.size).map { i =>
            val t = ts.get(i)
            GTok(seqInt(t.get("c")), t.get("s").asInt, t.get("l").asInt,
              t.has("hy1"), t.has("hy2"))
          }
          val lines = Seq.newBuilder[Seq[GTok]]
          var cur = Seq.newBuilder[GTok]
          var curEmpty = true
          toks.foreach { t =>
            cur += t; curEmpty = false
            val boundary =
              if (t.hy1) lbSet.contains(t.s)
              else lbSet.contains(t.s + t.l)
            if (boundary) {
              lines += cur.result(); cur = Seq.newBuilder[GTok]; curEmpty = true
            }
          }
          if (!curEmpty) reconstructable = false
          else {
            val regions = Seq.newBuilder[Seq[Seq[Seq[GTok]]]]
            var regAcc = Seq.newBuilder[Seq[Seq[GTok]]]
            var paraAcc = Seq.newBuilder[Seq[GTok]]
            var started = false
            lines.result().foreach { ln =>
              val s0 = ln.head.s
              val newReg = started && rbSet.contains(s0)
              if (started && (pbSet.contains(s0) || newReg)) {
                regAcc += paraAcc.result(); paraAcc = Seq.newBuilder[Seq[GTok]]
              }
              if (newReg) {
                regions += regAcc.result()
                regAcc = Seq.newBuilder[Seq[Seq[GTok]]]
              }
              paraAcc += ln
              started = true
            }
            if (started) { regAcc += paraAcc.result(); regions += regAcc.result() }
            pageGroups += regions.result()
          }
        }

        if (reconstructable) {
          // phase B: surplus rb occurrences are EMPTY regions (a region
          // with no tokens still records its start offset, so an empty
          // one duplicates the offset of whatever starts there). Place
          // each before the non-empty region sharing its offset, or at
          // the very end for trailing empties. Leading empties while no
          // text exists record nothing and are unobservable — ignored.
          val rbCount = mutable.Map.empty[Int, Int]
          rb.foreach(v => rbCount(v) = rbCount.getOrElse(v, 0) + 1)
          for (groups <- pageGroups; reg <- groups) {
            val start = reg.head.head.head.s
            if (start > 0) {
              rbCount(start) = rbCount.getOrElse(start, 0) - 1
              if (rbCount(start) < 0) reconstructable = false
            }
          }
          val surplus = rbCount.filter(_._2 > 0)
          val validKeys = pageGroups.flatten
            .map(_.head.head.head.s).toSet + ft.length
          if (!surplus.keys.forall(validKeys.contains)) reconstructable = false

          // same one level down: surplus pb occurrences are empty
          // PARAGRAPHS, placed before the paragraph sharing their offset
          val pbCount = mutable.Map.empty[Int, Int]
          pb.foreach(v => pbCount(v) = pbCount.getOrElse(v, 0) + 1)
          for (groups <- pageGroups; reg <- groups; para <- reg) {
            val start = para.head.head.s
            if (start > 0) {
              pbCount(start) = pbCount.getOrElse(start, 0) - 1
              if (pbCount(start) < 0) reconstructable = false
            }
          }
          val surplusPb = pbCount.filter(_._2 > 0)
          val validPbKeys = pageGroups.flatten.flatten
            .map(_.head.head.s).toSet + ft.length
          if (!surplusPb.keys.forall(validPbKeys.contains))
            reconstructable = false

          if (reconstructable) {
            var acc = ""
            val outLb = Seq.newBuilder[Int]
            val outPb = Seq.newBuilder[Int]
            val outRb = Seq.newBuilder[Int]
            val outSpans = Seq.newBuilder[(Int, Int)]
            val emptyRegion = CRegion(dummy, None, Nil)
            val emptyPara = CPara(dummy, Nil)
            val lastPage = pageGroups.size - 1
            for ((groups, p) <- pageGroups.zipWithIndex) {
              val cregions = Seq.newBuilder[CRegion]
              val lastGroup = groups.size - 1
              for ((paras, g) <- groups.zipWithIndex) {
                val start = paras.head.head.head.s
                for (_ <- 0 until surplus.getOrElse(start, 0))
                  cregions += emptyRegion
                surplus.remove(start)
                val cparas = Seq.newBuilder[CPara]
                val lastPara = paras.size - 1
                for ((pl, i) <- paras.zipWithIndex) {
                  val ps = pl.head.head.s
                  for (_ <- 0 until surplusPb.getOrElse(ps, 0))
                    cparas += emptyPara
                  surplusPb.remove(ps)
                  cparas += CPara(dummy, pl.map(ln =>
                    CLine(dummy, ln.map(tokOf(_, ft)))))
                  if (p == lastPage && g == lastGroup && i == lastPara)
                    for (_ <- 0 until surplusPb.getOrElse(ft.length, 0))
                      cparas += emptyPara
                }
                cregions += CRegion(dummy, None, cparas.result())
              }
              if (p == lastPage)
                for (_ <- 0 until surplus.getOrElse(ft.length, 0))
                  cregions += emptyRegion
              val fold = PaperRebuild.rebuildPage(cregions.result(), lg, acc)
              acc = fold.text
              outLb ++= fold.lineOffsets
              outPb ++= fold.paraOffsets
              outRb ++= fold.regionOffsets
              outSpans ++= fold.tokens.map(t => (t.s, t.l))
            }
            val id = doc.get("id").asText
            assert(acc == ft, s"$id: fulltext mismatch\n" +
              s"got:    ${acc.take(200)}\ngolden: ${ft.take(200)}")
            assert(outLb.result() == lb, s"$id: lb")
            assert(outPb.result() == pb, s"$id: pb")
            assert(outRb.result() == rb, s"$id: rb")
            val goldenSpans = (0 until ppreb.size).flatMap { p =>
              val ts = ppreb.get(p).get("t")
              (0 until ts.size).map(i =>
                (ts.get(i).get("s").asInt, ts.get(i).get("l").asInt))
            }
            assert(outSpans.result() == goldenSpans, s"$id: spans")
            passed += 1
          }
        }
        if (!reconstructable) { skipped += 1; attempted -= 1 }
      }
    }
    // census: 620 golden docs, 506 carry no fulltext at all (empty-text
    // page CIs); ALL 114 with text reconstruct and must round-trip
    // byte-exactly.
    info(s"round-tripped $passed docs ($skipped skipped: no text)")
    assert(passed >= 114, s"only $passed golden docs round-tripped")
    assert(passed == attempted)
  }
}
