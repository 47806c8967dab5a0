package graft.text

import scala.collection.mutable

import graft.model.Canonical._

/** The audio text-rebuild fold: ASR sections → fulltext with character
  * offsets, token time-code spans and break positions.
  *
  * Faithful re-expression of
  * text_preparation/rebuilders/audio_rebuilders.py:11-84
  * (`rebuild_audio_text`) as a pure per-row fold (SURVEY.md §2.9 R4).
  * Structure mirrors [[PaperRebuild]] with time codes instead of boxes:
  * section/utterance offsets are recorded only when text precedes; the
  * speech-segment break after a segment's last token is its start+len.
  */
object AudioRebuild {

  case class RecordFold(
      text: String,
      tokens: Seq[AudioTokenSpan],
      sections: Seq[Seq[Double]],
      speechSegOffsets: Seq[Int],
      utteranceOffsets: Seq[Int],
      sectionOffsets: Seq[Int])

  def rebuildRecord(
      sections: Seq[ASection],
      lang: Option[String],
      start: String): RecordFold = {
    val sb = new StringBuilder(start)
    val tokens = mutable.ArrayBuffer.empty[AudioTokenSpan]
    val secCoords = mutable.ArrayBuffer.empty[Seq[Double]]
    val ssOff = mutable.ArrayBuffer.empty[Int]
    val utOff = mutable.ArrayBuffer.empty[Int]
    val secOff = mutable.ArrayBuffer.empty[Int]

    for (sec <- sections) {
      if (sb.nonEmpty) secOff += sb.length
      secCoords += sec.tc
      for (utt <- Option(sec.u).getOrElse(Nil)) {
        if (sb.nonEmpty) utOff += sb.length
        for (seg <- Option(utt.ss).getOrElse(Nil)) {
          val ts = Option(seg.t).getOrElse(Nil)
          val last = ts.length - 1
          for ((token, n) <- ts.zipWithIndex) {
            if (token.tc != null && token.tc.nonEmpty) {
              val s = sb.length
              val text = token.tx.getOrElse("")
              val l = text.length
              val next = if (n != last) ts(n + 1).tx else None
              val prev = if (n != 0) ts(n - 1).tx else None
              val ws = Whitespace.insertAfter(token.tx, next, prev, lang)
              sb.append(if (ws) text + " " else text)
              if (n == last) ssOff += s + l
              tokens += AudioTokenSpan(token.tc, s, l)
            }
          }
        }
      }
    }
    RecordFold(sb.toString, tokens.toSeq, secCoords.toSeq,
      ssOff.toSeq, utOff.toSeq, secOff.toSeq)
  }

  case class PassimRecordFold(text: String, regions: Seq[PassimAudioRegion])

  /** Passim variant of the audio fold: per-token regions with time
    * coords; a speech segment's last token ends with a newline (the
    * audio analog of the paper fold's line ends,
    * paper passim rebuild paper_rebuilders.py:100-174), other tokens
    * follow the whitespace rules. Region length includes the trailing
    * separator, exactly like the paper variant. */
  def rebuildRecordPassim(
      sections: Seq[ASection],
      lang: Option[String],
      start: String): PassimRecordFold = {
    val sb = new StringBuilder(start)
    val out = mutable.ArrayBuffer.empty[PassimAudioRegion]
    for (sec <- sections; utt <- Option(sec.u).getOrElse(Nil);
         seg <- Option(utt.ss).getOrElse(Nil)) {
      val ts = Option(seg.t).getOrElse(Nil)
      val last = ts.length - 1
      for ((token, n) <- ts.zipWithIndex) {
        if (token.tc != null && token.tc.nonEmpty) {
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
          out += PassimAudioRegion(s, piece.length, token.tc)
        }
      }
    }
    PassimRecordFold(sb.toString, out.toSeq)
  }
}
