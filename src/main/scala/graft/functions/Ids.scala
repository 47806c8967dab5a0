package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical ID minting and parsing (SURVEY §2.7 C1–C3).
  *
  * The reference mints hierarchical IDs `{alias}-{yyyy}-{mm}-{dd}-{edition}`
  * for issues, `...-p0004` for pages and `...-i0048` for content items
  * (reference: docs/architecture.rst:23-46; canonical_path usage at
  * text_preparation/importers/core.py:264-278, olive/parsers.py:111-114).
  * IDs must be deterministic given the same input
  * (docs/architecture.rst:46) — all functions here are pure Column
  * expressions, codegen'd by Catalyst, no UDFs.
  */
object Ids {

  /** Mint an issue ID: `alias-yyyy-MM-dd-edition`. */
  def issueId(alias: Column, date: Column, edition: Column): Column =
    concat_ws("-", alias, date_format(date, "yyyy-MM-dd"), edition)

  /** Mint a content-item ID: `issueId-iNNNN` (zero-padded to 4). */
  def contentItemId(issueId: Column, n: Column): Column =
    concat(issueId, lit("-i"), lpad(n.cast("string"), 4, "0"))

  /** Mint a page ID: `issueId-pNNNN`. */
  def pageId(issueId: Column, n: Column): Column =
    concat(issueId, lit("-p"), lpad(n.cast("string"), 4, "0"))

  /** Parse the alias (title) back out of a canonical ID.
    * reference: rebuilders/helpers.py:194 (`ci["id"].split("-")`). */
  def aliasOf(id: Column): Column =
    regexp_extract(id, "^([^-]+)-", 1)

  /** Parse the ISO date out of a canonical ID. */
  def dateOf(id: Column): Column =
    to_date(regexp_extract(id, "^[^-]+-(\\d{4}-\\d{2}-\\d{2})-", 1))

  /** Parse the item number out of a `...-iNNNN` content-item ID. */
  def itemNumberOf(id: Column): Column =
    regexp_extract(id, "-i(\\d+)$", 1).cast("int")

  /** Provisional edition letter for the i-th issue of a day/year:
    * `a..z, aa, ab, ...` (bijective base-26). The reference's
    * `chr(97+i)` overflows past 'z' for more than 26 issues
    * (onb_annop/detect.py uses it unguarded); we extend the sequence
    * instead so IDs stay well-formed. */
  def editionLetter(i: Int): String = {
    require(i >= 0, s"edition index must be >= 0, got $i")
    val sb = new StringBuilder
    var n = i + 1 // bijective numeration
    while (n > 0) {
      n -= 1
      sb.insert(0, ('a' + n % 26).toChar)
      n /= 26
    }
    sb.toString
  }
}
