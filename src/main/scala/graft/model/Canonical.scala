package graft.model

/** Canonical data model — the engine's typed view of the reference's
  * canonical JSON schemas (SURVEY.md §1.2).
  *
  * Coordinates `c` are `[x, y, w, h]` int vectors; the token hierarchy is
  * region → paragraph → line → token
  * (reference: text_preparation/importers/mets_alto/alto.py:74-126).
  */
object Canonical {

  /** OCR token (alto.py:40-66; olive/parsers.py:200-253).
    * @param hy true when the token is the first half of a hyphenated word
    * @param nf normalized full form carried by the second half
    * @param gn "glue" flag: no whitespace after (olive/helpers.py:212) */
  case class CToken(
      c: Seq[Int],
      tx: Option[String],
      s: Option[Int],
      hy: Option[Boolean],
      nf: Option[String],
      gn: Option[Boolean])

  case class CLine(c: Seq[Int], t: Seq[CToken])

  case class CPara(c: Seq[Int], l: Seq[CLine])

  /** Page region; `pOf` links the region to its content item
    * (mets_alto/classes.py:122-131). */
  case class CRegion(c: Seq[Int], pOf: Option[String], p: Seq[CPara])

  /** Canonical page (schema per SURVEY.md §1.2; sample:
    * data/out/pages/FedGazDe-1857-01-03-a-pages.jsonl.bz2). */
  case class CanonicalPage(id: String, cc: Option[Boolean], r: Seq[CRegion])

  /** Token span in a rebuilt document: start offset `s` and length `l`
    * into the fulltext, plus the source coordinates
    * (rebuilders/paper_rebuilders.py:55-71). */
  case class TokenSpan(
      c: Seq[Int],
      s: Int,
      l: Int,
      hy1: Option[Boolean],
      hy2: Option[Boolean])

  /** Rebuilt page element of a solr doc (paper_rebuilders.py:215-224). */
  case class RebuiltPage(id: String, n: Int, t: Seq[TokenSpan], r: Seq[Seq[Int]])

  /** Rebuilt content item, solr format
    * (rebuilders/helpers.py:215-259 solr_ci). */
  case class RebuiltCI(
      id: String,
      ts: String,
      pp: Seq[Int],
      d: String,
      cc: Option[Boolean],
      olr: Boolean,
      st: String,
      sm: String,
      lg: Option[String],
      tp: Option[String],
      ro: Int,
      title: Option[String],
      iiif_link: Option[String],
      ppreb: Option[Seq[RebuiltPage]],
      lb: Option[Seq[Int]],
      pb: Option[Seq[Int]],
      rb: Option[Seq[Int]],
      ft: Option[String])

  // ---- audio (radio broadcast) path: time codes replace bounding boxes
  // (SURVEY.md §1.2; reference ina/helpers.py:30-89) ----

  /** ASR token: `tc = [start, duration]` in seconds. */
  case class AToken(tc: Seq[Double], tx: Option[String])

  case class SpeechSeg(tc: Seq[Double], t: Seq[AToken])

  case class Utterance(tc: Seq[Double], speaker: Option[String],
      ss: Seq[SpeechSeg])

  /** Audio section; `pOf` links it to its content item. */
  case class ASection(tc: Seq[Double], pOf: Option[String], u: Seq[Utterance])

  /** Canonical audio record (one per radio program;
    * ina/classes.py:52-62). */
  case class AudioRecord(id: String, cc: Option[Boolean], stt: Option[String],
      dur: Option[Double], s: Seq[ASection])

  /** Token span in a rebuilt audio doc (audio_rebuilders.py:51-84). */
  case class AudioTokenSpan(tc: Seq[Double], s: Int, l: Int)

  /** Rebuilt record element of an audio solr doc
    * (audio_rebuilders.py:204-210; `u` is always empty in the reference —
    * utterance coords are declared but never filled). */
  case class RebuiltRecord(id: String, n: Int, t: Seq[AudioTokenSpan],
      u: Seq[Seq[Double]], s: Seq[Seq[Double]])

  /** Rebuilt audio content item, solr format (helpers.py:215-259 +
    * audio_rebuilders.py:163-217). */
  case class RebuiltAudioCI(
      id: String,
      ts: String,
      rr: Seq[Int],
      d: String,
      cc: Boolean,
      olr: Boolean,
      st: String,
      sm: String,
      lg: Option[String],
      tp: Option[String],
      ro: Int,
      title: Option[String],
      rc: Option[String],
      rp: Option[String],
      stt: Option[String],
      dur: Option[Double],
      rreb: Seq[RebuiltRecord],
      ssb: Seq[Int],
      ub: Seq[Int],
      sb: Seq[Int],
      ft: String)

  /** Passim-format page region (rebuilders/helpers.py:291-311). */
  case class PassimCoords(x: Int, y: Int, w: Int, h: Int)
  case class PassimRegion(start: Int, length: Int, coords: PassimCoords)
  case class PassimPage(id: String, seq: Int, regions: Seq[PassimRegion])

  /** Rebuilt content item, passim format (helpers.py:262-311). */
  case class PassimDoc(
      series: String,
      date: String,
      id: String,
      cc: Option[Boolean],
      tp: Option[String],
      lg: Option[String],
      title: Option[String],
      pages: Seq[PassimPage],
      text: String)

  /** Passim-format audio token region: time coords replace boxes. The
    * reference's audio passim path is unfinished (audio_rebuilders.py:87
    * "TODO adapt to radio data" — it indexes page-shaped keys and the
    * `pprr` key its rejoin never sets); this is the working completion
    * of its declared intent: per-token regions with `tc` coords inside
    * an `audios` array (helpers.py:300-303 picks `audios` over
    * `pages` for audio CIs). */
  case class PassimAudioRegion(start: Int, length: Int, tc: Seq[Double])
  case class PassimAudio(id: String, seq: Int,
      sections: Seq[PassimAudioRegion])

  /** Rebuilt audio content item, passim format. */
  case class PassimAudioDoc(
      series: String,
      date: String,
      id: String,
      cc: Option[Boolean],
      tp: Option[String],
      lg: Option[String],
      title: Option[String],
      audios: Seq[PassimAudio],
      text: String)

  /** CI type normalization (rebuilders/helpers.py:36-48 TYPE_MAPPINGS).
    * Types not in the table pass through unchanged. */
  val TypeMappings: Map[String, Option[String]] = Map(
    "article" -> Some("ar"),
    "ar" -> Some("ar"),
    "advertisement" -> Some("ad"),
    "ad" -> Some("ad"),
    "pg" -> None,
    "page" -> None,
    "image" -> Some("img"),
    "table" -> Some("tb"),
    "death_notice" -> Some("ob"),
    "weather" -> Some("w"),
    "chronicle" -> Some("ch"))

  def mapType(tp: Option[String]): Option[String] =
    tp match {
      case Some(t) => TypeMappings.getOrElse(t, Some(t))
      case None => None
    }
}
