package graft.util

/** Minimal JSON string escaping shared by every hand-rolled JSON writer in
  * the repo (Verify's oracle_sql.json, the JSONL foreach sink): backslash,
  * quote, and ALL control chars (< 0x20) — one definition so a missed edge
  * can't drift between copies.
  */
object Json {

  /** `s` escaped and wrapped in double quotes. */
  def quote(s: String): String = "\"" + escape(s) + "\""

  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
