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
    * (rebuilders/helpers.py:29-34 IIIF_ENDPOINT_BASE_2_SUFFIX). */
  val EndpointSuffixes: Map[String, String] = Map(
    "https://ub-sipi.ub.unibas.ch/impresso" -> "max/0/default.jpg",
    "https://scriptorium.bcu-lausanne.ch/api" -> "300,/0/default.jpg")

  /** ARK identifier encoding: slashes → %2f (lux/helpers.py:40-52). */
  def encodeArk(ark: Column): Column = regexp_replace(ark, "/", "%2f")

  /** Full IIIF image URL: `base/x,y,w,h/suffix` with the endpoint-specific
    * suffix, defaulting to `full/0/default.jpg`. */
  def imageLink(baseUri: Column, coords: Column): Column = {
    val suffix = EndpointSuffixes.foldRight(lit("full/0/default.jpg")) {
      case ((endpoint, sfx), acc) =>
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
}
