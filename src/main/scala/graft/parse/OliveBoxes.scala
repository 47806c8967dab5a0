package graft.parse

import scala.xml.{Elem, Node}

/** Olive coordinate-conversion strategies (SURVEY.md §2.7 C8) — a pure
  * re-expression of olive/helpers.py:437-599 (`BoxStrategy`,
  * `get_scale_factor`, `compute_box`, `convert_box`).
  *
  * The reference decodes the unique jpg with OpenCV just to learn its
  * width (helpers.py:590-599); here the width comes from a pure-JVM
  * JPEG SOF header parse (PNG IHDR supported too), so the conversion
  * runs inside Spark tasks with no native image stack.
  *
  * Strategy semantics (helpers.py docstring):
  *  - `tif`: the jp2 facsimile was converted from the tif; scale =
  *    source dpi (page XML DataFiles PAGE_IMG XRESOLUTION_DPI) over
  *    Olive's IMAGES_RESOLUTION;
  *  - `png_highest`: jp2 from the highest-resolution png; Olive OCR
  *    used the same, so scale is 1 iff the png filename's resolution
  *    suffix equals IMAGES_RESOLUTION;
  *  - `png_uniq`: unimplemented in the reference ("TODO if needed");
  *  - `jpg_uniq`: single jpg; scale 1 iff its pixel width equals the
  *    page XML PAGE_WIDTH;
  *  - `jpg_highest`: declared in the enum but unhandled — falls
  *    through to None, as in the reference.
  */
object OliveBoxes {

  /** Round half-to-even, matching Python 3 `round()` (banker's
    * rounding) — `compute_box` parity depends on it. */
  private def pyRound(v: Double): Int =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toInt

  /** x1y1x2y2 → scaled xywh (olive/helpers.py:437-457 compute_box). */
  def computeBox(scaleFactor: Double, box: Seq[Int]): Seq[Int] = Seq(
    pyRound(box(0) * scaleFactor),
    pyRound(box(1) * scaleFactor),
    pyRound((box(2) - box(0)) * scaleFactor),
    pyRound((box(3) - box(1)) * scaleFactor))

  /** olive/helpers.py:460-475 convert_box — a list-based wrapper of
    * compute_box: Olive canonical coords are raw `x1 y1 x2 y2` boxes
    * (olive/parsers.py:186-217), converted here to scaled xywh. */
  def convertBox(coords: Seq[Int], scaleFactor: Double): Seq[Int] =
    computeBox(scaleFactor, coords)

  private def attrCI(n: Node, name: String): Option[String] =
    n.attributes.asAttrMap.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }

  private def meta(pageXml: Elem): Option[Node] =
    (pageXml \\ "_").find(_.label.equalsIgnoreCase("Meta"))

  /** olive/helpers.py:486-599 get_scale_factor. `readImage` supplies
    * raw image bytes by archive name (jpg_uniq only). */
  def scaleFactor(pageXml: Elem, boxStrategy: String, imgSourceName: String,
      readImage: String => Option[Array[Byte]]): Option[Double] =
    boxStrategy match {
      case "tif" =>
        for {
          m <- meta(pageXml)
          destRes <- attrCI(m, "IMAGES_RESOLUTION")
          files = (pageXml \\ "_").filter(_.label.equalsIgnoreCase("Files"))
          img <- files.find(f => attrCI(f, "TYPE").contains("PAGE_IMG") &&
            attrCI(f, "PRESENT").contains("1"))
          srcRes <- attrCI(img, "XRESOLUTION_DPI")
        } yield srcRes.toInt.toDouble / destRes.toInt

      case "png_highest" =>
        if (!imgSourceName.contains("_")) None
        else {
          val stem = imgSourceName.split("\\.")(0)
          val pngRes = stem.split("_", 2).last
          meta(pageXml).flatMap(attrCI(_, "IMAGES_RESOLUTION")) match {
            case Some(oliveRes) if oliveRes == pngRes => Some(1.0)
            case _ => None
          }
        }

      case "jpg_uniq" =>
        for {
          bytes <- readImage(imgSourceName)
          width <- jpegWidth(bytes)
          m <- meta(pageXml)
          oliveW <- attrCI(m, "PAGE_WIDTH")
          if width == oliveW.toInt
        } yield 1.0

      case _ => None // png_uniq (reference TODO), jpg_highest, unknown
    }

  /** Pixel width from a JPEG's SOF marker (pure JVM, no decoder). */
  def jpegWidth(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
      (bytes(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 9 < bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      val marker = bytes(i + 1) & 0xFF
      // standalone markers without a length segment
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
        i += 2
      } else {
        val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
        // SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          val w = ((bytes(i + 7) & 0xFF) << 8) | (bytes(i + 8) & 0xFF)
          return Some(w)
        }
        if (marker == 0xDA) return None // entropy data starts, no SOF seen
        i += 2 + len
      }
    }
    None
  }

  /** (width, height) from a PNG IHDR chunk (pure JVM). */
  def pngSize(bytes: Array[Byte]): Option[(Int, Int)] = {
    val sig = Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 24 ||
      !sig.indices.forall(i => (bytes(i) & 0xFF) == sig(i))) return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    Some((be32(16), be32(20)))
  }
}
