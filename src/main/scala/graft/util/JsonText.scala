package graft.util

/** The ONE JSON string escaper shared by every hand-rolled JSON writer
  * in the engine (Verify's oracle dump, Bench's artifact line,
  * StreamingSketch's part files — no JSON library ships in this
  * environment): backslash, quote, and ALL control chars (<0x20), so
  * builder-authored text can never break a strict json.loads
  * downstream. A divergent copy per writer is exactly how an escaping
  * fix would silently miss one of them.
  */
object JsonText {

  def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Left-to-right inverse of `esc` (a replace-chain unescape corrupts
    * `\\n` — literal backslash then n — into backslash+newline; scanning
    * consumes each escape exactly once).
    */
  def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n'  => b += '\n'; i += 2
          case 'r'  => b += '\r'; i += 2
          case 't'  => b += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case _ => b += c; i += 1
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }
}
