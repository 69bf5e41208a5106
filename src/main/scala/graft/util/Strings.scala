package graft.util

/** String utilities mirroring the reference (F8, SURVEY.md §2.8). */
object Strings {

  /** Codepoint-safe prefix truncation — Go's rune semantics
    * (/root/reference/utils.go:23-35): maxLen counts Unicode codepoints
    * (not UTF-16 units), negative clamps to 0.
    */
  def truncateString(s: String, maxLen0: Int): String = {
    val maxLen = math.max(0, maxLen0)
    if (maxLen == 0) return ""
    val n = s.codePointCount(0, s.length)
    if (n <= maxLen) s
    else s.substring(0, s.offsetByCodePoints(0, maxLen))
  }
}
