package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Canonical._
import graft.text.PaperRebuild

/** Round-trip verification against the reference's golden REBUILT
  * output (data/rebuilt_out/CL/CL-1882 — produced by the
  * reference's own rebuilder; its canonical inputs are NOT in-repo, so
  * the goldens cannot be regenerated, but they can be inverted):
  * reconstruct each content item's canonical tokens from the golden
  * token spans (tx = ft[s, s+l)), partition them into lines/paras/
  * regions with the recorded lb/pb/rb break offsets, re-run OUR fold,
  * and require byte-identical fulltext, spans and break lists. This
  * checks the fold AND the whitespace rules against text the actual
  * reference emitted, not just our hand-computed fixtures.
  *
  * Docs with hyphenation spans are skipped (the merged form is not
  * invertible); the spec asserts a large majority of docs round-trip.
  */
class GoldenRebuiltSpec extends AnyFunSuite {

  private val goldenDir =
    "/root/reference/text_preparation/data/rebuilt_out/CL/CL-1882"
  private val mapper = new ObjectMapper()

  private case class GTok(c: Seq[Int], s: Int, l: Int,
      hy1: Boolean, hy2: Boolean)

  private def seqInt(n: JsonNode): Seq[Int] =
    (0 until n.size).map(n.get(_).asInt)

  test("golden CL-1882 rebuilt docs round-trip through the fold") {
    var attempted = 0
    var passed = 0
    var skipped = 0
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
        // rebuild per page, threading the fulltext like rebuildOne
        var acc = ""
        val outLb = Seq.newBuilder[Int]
        val outPb = Seq.newBuilder[Int]
        val outRb = Seq.newBuilder[Int]
        val outSpans = Seq.newBuilder[(Int, Int)]
        var reconstructable = true
        for (p <- 0 until ppreb.size if reconstructable) {
          val page = ppreb.get(p)
          val ts = page.get("t")
          val toks = (0 until ts.size).map { i =>
            val t = ts.get(i)
            GTok(seqInt(t.get("c")), t.get("s").asInt, t.get("l").asInt,
              t.has("hy1"), t.has("hy2"))
          }
          val rCoords = Option(page.get("r")).map(r =>
            (0 until r.size).map(i => seqInt(r.get(i)))).getOrElse(Nil)
          // partition into lines: a line closes at a non-hy token whose
          // end offset is a recorded break, or at a hy1 token whose
          // START is one (the fold records `s` for trailing hy tokens)
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
          if (!curEmpty) reconstructable = false // line without boundary
          else {
            // group lines into paras (pb at line-start s) and regions (rb)
            val allLines = lines.result()
            val regions = Seq.newBuilder[Seq[Seq[Seq[GTok]]]]
            var regAcc = Seq.newBuilder[Seq[Seq[GTok]]]
            var paraAcc = Seq.newBuilder[Seq[GTok]]
            var regStarted = false
            var paraStarted = false
            allLines.foreach { ln =>
              val s0 = ln.head.s
              val newReg = regStarted && rbSet.contains(s0)
              val newPara = paraStarted && (pbSet.contains(s0) || newReg)
              if (newPara) {
                regAcc += paraAcc.result(); paraAcc = Seq.newBuilder[Seq[GTok]]
              }
              if (newReg) {
                regions += regAcc.result()
                regAcc = Seq.newBuilder[Seq[Seq[GTok]]]
              }
              paraAcc += ln
              regStarted = true; paraStarted = true
            }
            if (paraStarted) regAcc += paraAcc.result()
            if (regStarted) regions += regAcc.result()
            val regs = regions.result()
            if (regs.size != rCoords.size) reconstructable = false
            else {
              // hy1 text is not recoverable from ft (the fold drops it);
              // a filler of the right length ending in '-' reproduces
              // the span + boundary arithmetic, and the default
              // whitespace rules never read the dropped text. hy2
              // tokens get their nf from the fulltext slice.
              def tokOf(t: GTok): CToken =
                if (t.hy1) CToken(t.c,
                  Some(("~" * math.max(t.l + 1, 0)) + "-"),
                  None, Some(true), None, None)
                else if (t.hy2) CToken(t.c,
                  Some(ft.substring(t.s, t.s + t.l)),
                  None, None, Some(ft.substring(t.s, t.s + t.l)), None)
                else CToken(t.c, Some(ft.substring(t.s, t.s + t.l)),
                  None, None, None, None)
              val cregions = regs.zip(rCoords).map { case (paras, rc) =>
                CRegion(rc, None, paras.map(pl => CPara(rc, pl.map(ln =>
                  CLine(rc, ln.map(tokOf))))))
              }
              val fold = PaperRebuild.rebuildPage(cregions, lg, acc)
              acc = fold.text
              outLb ++= fold.lineOffsets
              outPb ++= fold.paraOffsets
              outRb ++= fold.regionOffsets
              outSpans ++= fold.tokens.map(t => (t.s, t.l))
            }
          }
        }
        if (!reconstructable) { skipped += 1; attempted -= 1 }
        else {
          assert(acc == ft, s"${doc.get("id").asText}: fulltext mismatch\n" +
            s"got:    ${acc.take(200)}\ngolden: ${ft.take(200)}")
          assert(outLb.result() == lb, s"${doc.get("id").asText}: lb")
          assert(outPb.result() == pb, s"${doc.get("id").asText}: pb")
          assert(outRb.result() == rb, s"${doc.get("id").asText}: rb")
          val goldenSpans = (0 until ppreb.size).flatMap { p =>
            val ts = ppreb.get(p).get("t")
            (0 until ts.size).map(i =>
              (ts.get(i).get("s").asInt, ts.get(i).get("l").asInt))
          }
          assert(outSpans.result() == goldenSpans,
            s"${doc.get("id").asText}: spans")
          passed += 1
        }
      }
    }
    // census: 620 golden docs, 506 carry no fulltext at all (empty-text
    // page CIs); of the 114 with text, docs whose span partition cannot
    // be inverted (empty regions produce duplicate rb offsets whose
    // position is ambiguous across pages) are skipped. EVERY doc whose
    // canonical form is reconstructible must round-trip byte-exactly.
    info(s"round-tripped $passed docs ($skipped skipped: no text or " +
      "irreconstructible span partition)")
    assert(passed >= 60, s"only $passed golden docs round-tripped")
    assert(passed == attempted)
  }
}
