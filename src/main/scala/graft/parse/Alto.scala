package graft.parse

import scala.xml.{Elem, Node}

import graft.model.Canonical._

/** ALTO XML parsing → canonical page regions.
  *
  * Re-expression of text_preparation/importers/mets_alto/alto.py as pure
  * functions over scala-xml nodes — executed executor-side inside the
  * import job's flatMap (SURVEY.md §2.8), JVM-native so there is no
  * Python-UDF tax.
  */
object Alto {

  /** `[x, y, w, h]` from HPOS/VPOS/WIDTH/HEIGHT (alto.py:7-28;
    * `int(float(v))` — truncation, not rounding). */
  def distillCoordinates(e: Node): Option[Seq[Int]] = {
    def attr(n: String): Option[String] =
      e.attribute(n).map(_.text).filter(_.nonEmpty)
    for {
      x <- attr("HPOS"); y <- attr("VPOS")
      w <- attr("WIDTH"); h <- attr("HEIGHT")
    } yield Seq(x, y, w, h).map(v => v.toDouble.toInt)
  }

  /** Parse a `<TextLine>`: its coordinates and `<String>` tokens, with
    * ALTO hyphenation (SUBS_TYPE HypPart1/HypPart2 → hy/nf;
    * alto.py:30-74). Tokens without coordinates are dropped with a note. */
  def parseTextLine(line: Node): (CLine, Seq[String]) = {
    val lineCoords = distillCoordinates(line).getOrElse(Nil)
    val notes = Seq.newBuilder[String]
    val tokens = (line \ "String").flatMap { s =>
      distillCoordinates(s) match {
        case None =>
          notes += s"Token ${s.attribute("ID").map(_.text).getOrElse("")} does not have coordinates"
          None
        case Some(coords) =>
          val content = s.attribute("CONTENT").map(_.text).getOrElse("")
          val subsType = s.attribute("SUBS_TYPE").map(_.text)
          val (tx, hy, nf) = subsType match {
            case Some("HypPart1") => (content + "-", Some(true), None)
            case Some("HypPart2") =>
              (content, None, s.attribute("SUBS_CONTENT").map(_.text))
            case _ => (content, None, None)
          }
          Some(CToken(coords, Some(tx), None, hy, nf, None))
      }
    }
    (CLine(lineCoords, tokens), notes.result())
  }

  /** Parse the `<PrintSpace>`: each direct child block becomes a region
    * holding one paragraph with all the block's (recursive) text lines
    * (alto.py:76-131). `mappings` links OCR block ids to content items. */
  def parsePrintSpace(
      printSpace: Option[Node],
      mappings: Map[String, String]): (Seq[CRegion], Seq[String]) = {
    val notes = Seq.newBuilder[String]
    val regions = printSpace.toSeq.flatMap { ps =>
      ps.child.collect { case e: Elem => e }.flatMap { block =>
        val blockId = block.attribute("ID").map(_.text)
        val pOf = blockId.flatMap(mappings.get)
        distillCoordinates(block).map { coords =>
          val parsed = (block \\ "TextLine").map(parseTextLine)
          parsed.foreach(p => notes ++= p._2)
          val para = CPara(coords, parsed.map(_._1))
          CRegion(coords, pOf, Seq(para))
        }
      }
    }
    (regions, notes.result())
  }

  /** Font style entry from a `<TextStyle>` (alto.py:134-157). */
  case class FontStyle(id: Option[String], fs: Option[Double], f: Option[String])

  def parseStyle(e: Node): FontStyle = {
    def attr(n: String): Option[String] = e.attribute(n).map(_.text)
    val family = attr("FONTFAMILY")
    val style = attr("FONTSTYLE")
    val name = (family, style) match {
      case (Some(fam), Some(st)) => Some(s"$fam-$st")
      case (fam, None) => fam
      case (None, Some(st)) => Some(s"null-$st")
    }
    FontStyle(attr("ID"), attr("FONTSIZE").filter(_.nonEmpty).map(_.toDouble),
      name)
  }
}
