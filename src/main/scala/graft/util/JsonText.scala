package graft.util

/** Shared JSON string escaping for the hand-written JSON the two mains
  * emit (Verify's oracle_sql.json, Bench's metric line) — one escaper so
  * a fix can't land in one and silently miss the other.
  *
  * Escapes backslash, quote, and ALL control chars (<0x20): a tab or CR
  * in builder-authored SQL would otherwise make the driver's json.load
  * fail and zero the round's correctness. */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
