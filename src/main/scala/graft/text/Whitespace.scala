package graft.text

/** Language-specific whitespace insertion rules for text rebuilding.
  *
  * Re-expression of the reference's rules
  * (text_preparation/tokenization.py:9-60; rules table
  * importer_scripts/tetml2canonical.py:917-933). A language without rules
  * defaults to inserting whitespace — observable in the reference's golden
  * rebuilt output (data/rebuilt_out/CL/CL-1882/0.json has `lg: null` and
  * space-separated fulltext).
  */
object Whitespace {

  /** Per-language punctuation classes. */
  case class Rules(
      noWsBefore: Set[String],
      noWsAfter: Set[String],
      noWsBeforeAfter: Set[String],
      pctNumber: Set[String])

  val ByLanguage: Map[String, Rules] = Map(
    "fr" -> Rules(
      noWsBefore = Set(".", ",", ")", "]", "}", "°", "..."),
      noWsAfter = Set("(", "[", "{"),
      noWsBeforeAfter = Set("'", "-"),
      pctNumber = Set(".", ",")),
    "de" -> Rules(
      noWsBefore = Set(".", ";", ":", ",", ")", "]", "}", "°", "...", "»"),
      noWsAfter = Set("(", "[", "{", "«"),
      noWsBeforeAfter = Set("-"),
      pctNumber = Set(".", ",")))

  private def isDigits(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)

  /** Should a whitespace be inserted after `token`?
    *
    * Mirrors tokenization.py:29-60 exactly, with one deliberate deviation:
    * an unknown language inserts whitespace instead of never inserting it
    * (matching the goldens; the in-repo reference returns None there and
    * would glue all tokens together).
    */
  def insertAfter(
      token: Option[String],
      next: Option[String],
      prev: Option[String],
      lang: Option[String]): Boolean = {
    val rules = lang.flatMap(ByLanguage.get) match {
      case Some(r) => r
      case None => return true
    }
    val t = token.getOrElse("")
    val n = next.getOrElse("")
    if (rules.noWsBeforeAfter.contains(t) || rules.noWsBeforeAfter.contains(n)) false
    else if (rules.noWsBefore.contains(n)) false
    else if (rules.noWsAfter.contains(t)) false
    else if (rules.pctNumber.contains(t) && prev.isDefined && next.isDefined &&
      isDigits(prev.get) && isDigits(next.get)) false
    else true
  }
}
