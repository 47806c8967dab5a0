package graft.util

/** Minimal ordered-JSON AST + renderer for canonical JSONL output.
  *
  * The canonical formats are optional-field-heavy (a field is *absent*, not
  * null, when missing — e.g. `t` only when a title exists), which maps badly
  * onto fixed-schema DataFrames at write time. Importers therefore build
  * documents as [[JValue]] and serialize per row to a JSON line; readers use
  * declared StructTypes as usual.
  */
object Json {

  sealed trait JValue { def render(sb: StringBuilder): Unit }

  case object JNull extends JValue {
    def render(sb: StringBuilder): Unit = sb.append("null")
  }
  final case class JBool(v: Boolean) extends JValue {
    def render(sb: StringBuilder): Unit = sb.append(v)
  }
  final case class JInt(v: Long) extends JValue {
    def render(sb: StringBuilder): Unit = sb.append(v)
  }
  final case class JDouble(v: Double) extends JValue {
    def render(sb: StringBuilder): Unit =
      if (v == math.floor(v) && !v.isInfinite) sb.append(v.toLong).append(".0")
      else sb.append(v)
  }
  final case class JStr(v: String) extends JValue {
    def render(sb: StringBuilder): Unit = {
      sb.append('"')
      v.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
  }
  final case class JArr(vs: Seq[JValue]) extends JValue {
    def render(sb: StringBuilder): Unit = {
      sb.append('[')
      var first = true
      vs.foreach { v =>
        if (!first) sb.append(',')
        first = false
        v.render(sb)
      }
      sb.append(']')
    }
  }
  /** Insertion-ordered object; absent fields are simply not added. */
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue {
    def render(sb: StringBuilder): Unit = {
      sb.append('{')
      var first = true
      fields.foreach { case (k, v) =>
        if (!first) sb.append(',')
        first = false
        JStr(k).render(sb)
        sb.append(':')
        v.render(sb)
      }
      sb.append('}')
    }
  }

  object JObj {
    /** Build from optional fields: None entries are omitted. */
    def sparse(fields: (String, Option[JValue])*): JObj =
      JObj(fields.collect { case (k, Some(v)) => k -> v })
  }

  def render(v: JValue): String = {
    val sb = new StringBuilder
    v.render(sb)
    sb.toString
  }

  def ints(xs: Seq[Int]): JArr = JArr(xs.map(x => JInt(x.toLong)))
  def strs(xs: Seq[String]): JArr = JArr(xs.map(JStr))
}
