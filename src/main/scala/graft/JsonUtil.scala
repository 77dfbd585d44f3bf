package graft

/** Minimal JSON string escaping shared by the two driver artifacts
  * (Verify's oracle_sql.json/errors.json and Bench's one-line report).
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or CR
  * in builder-authored SQL or an exception message would otherwise make
  * the driver's json.load fail and silently zero the round's artifact.
  */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `{"k":"v",...}` with both sides escaped, keys in iteration order. */
  def obj(kvs: Iterable[(String, String)]): String =
    kvs.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
}
