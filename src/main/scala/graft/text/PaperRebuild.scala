package graft.text

import scala.collection.mutable

import graft.model.Canonical._

/** The paper text-rebuild fold: canonical page regions → fulltext with
  * character offsets, token spans and break positions.
  *
  * Faithful re-expression of
  * text_preparation/rebuilders/paper_rebuilders.py:10-97
  * (`rebuild_paper_text`) and 100-174 (`rebuild_paper_text_passim`)
  * as a pure per-row Scala fold — executed inside a typed `Dataset.map`,
  * so it is a single pass per content item with no cross-row state
  * (SURVEY.md §2.9 R3/R7).
  */
object PaperRebuild {

  /** Per-page fold result. */
  case class PageFold(
      text: String,
      tokens: Seq[TokenSpan],
      regions: Seq[Seq[Int]],
      lineOffsets: Seq[Int],
      paraOffsets: Seq[Int],
      regionOffsets: Seq[Int])

  /** Rebuild one page's regions (already filtered to the content item),
    * appending to `start` (the fulltext accumulated from earlier pages).
    *
    * Semantics preserved from the reference:
    *  - `hy` tokens (first half of a hyphenated word) contribute a token
    *    span of length len(tx)-2 but NO text;
    *  - `nf` tokens (second half) contribute the normalized full form;
    *  - region/paragraph offsets are recorded only when text precedes;
    *  - the line-break offset for a trailing `hy` token is its start, for
    *    any other trailing token its start + len(tx) — the ORIGINAL tx
    *    even when `nf` text was appended (paper_rebuilders.py:86-93);
    *  - tokens missing coordinates are skipped entirely (:52-54).
    */
  def rebuildPage(
      regions: Seq[CRegion],
      lang: Option[String],
      start: String): PageFold = {
    val sb = new StringBuilder(start)
    val tokens = mutable.ArrayBuffer.empty[TokenSpan]
    val regionCoords = mutable.ArrayBuffer.empty[Seq[Int]]
    val lineOff = mutable.ArrayBuffer.empty[Int]
    val paraOff = mutable.ArrayBuffer.empty[Int]
    val regionOff = mutable.ArrayBuffer.empty[Int]

    for (reg <- regions) {
      if (sb.nonEmpty) regionOff += sb.length
      regionCoords += reg.c
      for (para <- Option(reg.p).getOrElse(Nil)) {
        if (sb.nonEmpty) paraOff += sb.length
        for (line <- Option(para.l).getOrElse(Nil)) {
          val ts = Option(line.t).getOrElse(Nil)
          val last = ts.length - 1
          for ((token, n) <- ts.zipWithIndex) {
            if (token.c != null && token.c.nonEmpty) {
              val s = sb.length
              val tx = token.tx
              val isHy = token.hy.contains(true)
              val (len, hy1, hy2, text) =
                if (isHy)
                  (math.max(tx.getOrElse("").length - 2, -1), Some(true), None, "")
                else if (token.nf.isDefined)
                  (token.nf.get.length, None, Some(true), token.nf.get)
                else {
                  val t = tx.getOrElse("")
                  (t.length, None, None, t)
                }
              if (!isHy) {
                val next = if (n != last) ts(n + 1).tx else None
                val prev = if (n != 0) ts(n - 1).tx else None
                val ws = Whitespace.insertAfter(tx, next, prev, lang)
                sb.append(if (ws) text + " " else text)
              }
              if (n == last) {
                if (isHy) lineOff += s
                else lineOff += s + tx.getOrElse("").length
              }
              tokens += TokenSpan(token.c, s, len, hy1, hy2)
            }
          }
        }
      }
    }
    PageFold(sb.toString, tokens.toSeq, regionCoords.toSeq,
      lineOff.toSeq, paraOff.toSeq, regionOff.toSeq)
  }

  /** Passim-variant fold: newline-terminated lines, per-token regions
    * with xywh coords (paper_rebuilders.py:100-174). Hyphenation is NOT
    * collapsed in the passim format (the reference keeps raw `tx`). */
  case class PassimFold(text: String, regions: Seq[PassimRegion])

  def rebuildPagePassim(
      regions: Seq[CRegion],
      lang: Option[String],
      start: String): PassimFold = {
    val sb = new StringBuilder(start)
    val out = mutable.ArrayBuffer.empty[PassimRegion]
    for (reg <- regions; para <- Option(reg.p).getOrElse(Nil);
         line <- Option(para.l).getOrElse(Nil)) {
      val ts = Option(line.t).getOrElse(Nil)
      val last = ts.length - 1
      for ((token, n) <- ts.zipWithIndex) {
        if (token.c != null && token.c.nonEmpty) {
          val s = sb.length
          val tx = token.tx.getOrElse("")
          val piece =
            if (n == last) tx + "\n"
            else {
              val ws = Whitespace.insertAfter(token.tx, ts(n + 1).tx,
                if (n != 0) ts(n - 1).tx else None, lang)
              if (ws) tx + " " else tx
            }
          sb.append(piece)
          val Seq(x, y, w, h) = token.c.take(4)
          out += PassimRegion(s, piece.length, PassimCoords(x, y, w, h))
        }
      }
    }
    PassimFold(sb.toString, out.toSeq)
  }
}
