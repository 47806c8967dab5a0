package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Canonical._
import graft.text.AudioRebuild

class AudioRebuildSpec extends AnyFunSuite {

  private def tok(tx: String, start: Double, dur: Double) =
    AToken(Seq(start, dur), Some(tx))

  test("audio fold: offsets, time-code spans and breaks, hand-computed") {
    // section 1: one utterance, two speech segments
    val sections = Seq(
      ASection(Seq(0.0, 10.0), Some("X-i0001"), Seq(
        Utterance(Seq(0.0, 10.0), Some("spk1"), Seq(
          SpeechSeg(Seq(0.0, 5.0), Seq(tok("Bonjour", 0.0, 1.0),
            tok("tout", 1.0, 0.5))),
          SpeechSeg(Seq(5.0, 5.0), Seq(tok("le", 5.0, 0.3),
            tok("monde", 5.3, 0.7))))))),
      ASection(Seq(10.0, 4.0), Some("X-i0001"), Seq(
        Utterance(Seq(10.0, 4.0), None, Seq(
          SpeechSeg(Seq(10.0, 4.0), Seq(tok("Merci", 10.0, 1.0))))))))
    val f = AudioRebuild.rebuildRecord(sections, None, "")
    assert(f.text == "Bonjour tout le monde Merci ")
    // speech-seg break after last token of each segment: s + l
    assert(f.speechSegOffsets == Seq(12, 21, 27))
    // second section/utterance offsets recorded because text precedes
    assert(f.sectionOffsets == Seq(22))
    assert(f.utteranceOffsets == Seq(22))
    assert(f.sections == Seq(Seq(0.0, 10.0), Seq(10.0, 4.0)))
    val spans = f.tokens.map(t => (t.s, t.l))
    assert(spans == Seq((0, 7), (8, 4), (13, 2), (16, 5), (22, 5)))
    assert(f.tokens.head.tc == Seq(0.0, 1.0))
  }

  test("passim audio fold: newline-terminated speech segments, tc regions") {
    val sections = Seq(
      ASection(Seq(0.0, 10.0), Some("X-i0001"), Seq(
        Utterance(Seq(0.0, 10.0), Some("spk1"), Seq(
          SpeechSeg(Seq(0.0, 5.0), Seq(tok("Bonjour", 0.0, 1.0),
            tok("tout", 1.0, 0.5))),
          SpeechSeg(Seq(5.0, 5.0), Seq(tok("le", 5.0, 0.3),
            tok("monde", 5.3, 0.7))))))))
    val f = AudioRebuild.rebuildRecordPassim(sections, None, "")
    // each speech segment ends with a newline (line analog)
    assert(f.text == "Bonjour tout\nle monde\n")
    val rs = f.regions.map(r => (r.start, r.length, r.tc))
    assert(rs == Seq(
      (0, 8, Seq(0.0, 1.0)), (8, 5, Seq(1.0, 0.5)),
      (13, 3, Seq(5.0, 0.3)), (16, 6, Seq(5.3, 0.7))))
    // region lengths tile the text exactly
    assert(f.regions.map(_.length).sum == f.text.length)
    // appending across records continues offsets
    val f2 = AudioRebuild.rebuildRecordPassim(sections, None, f.text)
    assert(f2.regions.head.start == f.text.length)
  }

  test("audio fold appends across records like the paper fold") {
    val sec = Seq(ASection(Seq(0.0, 1.0), None, Seq(
      Utterance(Seq(0.0, 1.0), None, Seq(
        SpeechSeg(Seq(0.0, 1.0), Seq(tok("one", 0.0, 1.0))))))))
    val f1 = AudioRebuild.rebuildRecord(sec, None, "")
    val f2 = AudioRebuild.rebuildRecord(sec, None, f1.text)
    assert(f2.text == "one one ")
    assert(f2.sectionOffsets == Seq(4))
  }
}
