package graft.tools

/** Minimal JSON string escaping shared by the driver-facing mains
  * (Verify's oracle_sql.json, Bench's metric line). Escapes
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL would otherwise break the driver's
  * json.load.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
