package graft

/** Minimal RFC 8259 string escaping for the CLIs' one-line JSON
  * summaries. Fixed-alphabet values (modes, langs, sources, paths the
  * caller chose without quotes) interpolate raw; ANY value that can
  * carry arbitrary text — corpus words, CLI tokens, generation directory
  * names — must go through `str` (ADVICE r15: an unescaped quote in a
  * heavy-hitter word produced an invalid summary line). */
object Json {

  /** `s` as a JSON string literal, quotes included. */
  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
