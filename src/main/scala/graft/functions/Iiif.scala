package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IIIF link construction (SURVEY.md §2.7 C16–C17).
  *
  * Mirrors rebuilders/helpers.py:417-485 (endpoint-specific suffixes) and
  * lux/helpers.py:40-52 (ark encoding) as pure string expressions.
  */
object Iiif {

  /** Endpoint base → image-request suffix
    * (rebuilders/helpers.py:29-34 IIIF_ENDPOINT_BASE_2_SUFFIX). Kept as an
    * ordered Seq: the reference's dict loop lets the LAST matching base
    * win, so all lookups below fold left with last-match-wins. */
  val EndpointSuffixes: Seq[(String, String)] = Seq(
    "https://ub-sipi.ub.unibas.ch/impresso" -> "max/0/default.jpg",
    "https://scriptorium.bcu-lausanne.ch/api" -> "300,/0/default.jpg")

  /** ARK identifier encoding: slashes → %2f (lux/helpers.py:40-52). */
  def encodeArk(ark: Column): Column = regexp_replace(ark, "/", "%2f")

  /** Full IIIF image URL: `base/x,y,w,h/suffix` with the endpoint-specific
    * suffix, defaulting to `full/0/default.jpg`. */
  def imageLink(baseUri: Column, coords: Column): Column = {
    val suffix = EndpointSuffixes.foldLeft(lit("full/0/default.jpg")) {
      case (acc, (endpoint, sfx)) =>
        when(baseUri.startsWith(endpoint), lit(sfx)).otherwise(acc)
    }
    concat_ws("/", baseUri,
      concat_ws(",", element_at(coords, 1), element_at(coords, 2),
        element_at(coords, 3), element_at(coords, 4)),
      suffix)
  }

  /** `info.json` descriptor link for a page. */
  def infoLink(baseUri: Column): Column =
    concat(baseUri, lit("/info.json"))

  /** Reconstruct the IIIF image link for an img-type content item from
    * its canonical `iiif_link` + coordinates — a faithful port of
    * `reconstruct_iiif_link` (rebuilders/helpers.py:441-485, incl. the
    * get_iiif_and_coords precedence of helpers.py:417-437):
    *
    *  - the stored link may end in `info.json` (the common case: strip
    *    it and append `x,y,w,h/<endpoint suffix>`),
    *  - or in `default.jpg` (already an image request: keep it verbatim
    *    when it embeds the right coords+suffix, else strip the last
    *    three path segments and rebuild),
    *  - any other suffix is treated as a base segment to drop (the
    *    reference warns and rebuilds the same way).
    *
    * Endpoint-specific suffixes (SWA/BCUL) are chosen by substring
    * containment on the base, as in the reference. Returns None when
    * either the link or the coords are absent/empty. Used from the
    * rebuild's typed fold; plain Scala, no UDF registration needed. */
  def reconstructImageLink(iiif: Option[String],
      coords: Option[Seq[Int]]): Option[String] =
    for {
      link <- iiif if link.nonEmpty
      cs <- coords if cs.nonEmpty
    } yield {
      val coordStr = cs.mkString(",")
      val cut = link.lastIndexOf('/')
      val uriBase0 = if (cut >= 0) link.substring(0, cut) else ""
      val oldSuffix = link.substring(cut + 1)
      val imgSuffix = EndpointSuffixes.foldLeft("full/0/default.jpg") {
        case (acc, (base, sfx)) => if (uriBase0.contains(base)) sfx else acc
      }
      if (oldSuffix == "default.jpg") {
        if (link.contains(coordStr) && link.contains(imgSuffix)) link
        else {
          // image request with wrong coords/suffix: drop region/size/
          // rotation segments back to the identifier base
          val uriBase = uriBase0.split("/").dropRight(3).mkString("/")
          s"$uriBase/$coordStr/$imgSuffix"
        }
      } else s"$uriBase0/$coordStr/$imgSuffix"
    }
}
