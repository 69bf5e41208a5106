package graft.html

/** HTML character-reference decoding (named subset + numeric), matching the
  * behavior a tolerant HTML5 tokenizer exposes to the pipeline: entities are
  * decoded in text nodes and attribute values.
  */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "deg" -> "°", "plusmn" -> "±",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "hellip" -> "…", "bull" -> "•", "dagger" -> "†",
    "times" -> "×", "divide" -> "÷", "sect" -> "§",
    "para" -> "¶", "micro" -> "µ", "cent" -> "¢",
    "pound" -> "£", "yen" -> "¥", "euro" -> "€",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "szlig" -> "ß", "ntilde" -> "ñ",
    "larr" -> "←", "rarr" -> "→", "uarr" -> "↑",
    "darr" -> "↓", "harr" -> "↔", "shy" -> "­"
  )
  // Legacy references valid without trailing semicolon.
  private val legacy = Set("amp", "lt", "gt", "quot", "nbsp", "copy", "reg")

  /** Decode all character references in s. Unknown references are kept
    * verbatim (tolerant behavior).
    */
  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val amp = s.indexOf('&', i)
      if (amp < 0) { sb.append(s, i, n): Unit; i = n }
      else {
        // bulk-append the plain run, then handle the reference at `amp`
        if (amp > i) sb.append(s, i, amp): Unit
        i = amp

        // try numeric
        if (i + 2 < s.length && s.charAt(i + 1) == '#') {
          var j = i + 2
          var hex = false
          if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
            hex = true; j += 1
          }
          val start = j
          while (j < s.length && isDigitOf(s.charAt(j), hex)) j += 1
          if (j > start) {
            val codeStr = s.substring(start, j)
            val cp =
              try Integer.parseInt(codeStr, if (hex) 16 else 10)
              catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(math.max(cp, 1))) {
              val actual = if (cp == 0) 0xfffd else cp
              sb.append(Character.toChars(actual)): Unit
              i = if (j < s.length && s.charAt(j) == ';') j + 1 else j
            } else { sb.append('&'): Unit; i += 1 }
          } else { sb.append('&'): Unit; i += 1 }
        } else {
          // named
          var j = i + 1
          while (j < s.length && j - i <= 32 && s.charAt(j).isLetterOrDigit) j += 1
          val name = s.substring(i + 1, j)
          val hasSemi = j < s.length && s.charAt(j) == ';'
          named.get(name) match {
            case Some(v) if hasSemi =>
              sb.append(v): Unit; i = j + 1
            case Some(v) if legacy.contains(name) =>
              sb.append(v): Unit; i = j
            case _ =>
              sb.append('&'): Unit; i += 1
          }
        }
      }
    }
    sb.toString
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'
}
