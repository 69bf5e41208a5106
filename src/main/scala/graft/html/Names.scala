package graft.html

/** Canonical lowercase-name interning for the tokenizer: common tag and
  * attribute names resolve to shared literal constants without allocating
  * the substring or its toLowerCase copy (two allocations per tag and per
  * attribute in the previous tokenizer — a top allocation site in the
  * extraction kernel's parse phase).
  *
  * Contract: `lowerName(src, start, end)` is VALUE-EQUAL to
  * `src.substring(start, end).toLowerCase` for every input — the fallback
  * path IS that expression, and the fast path only fires for all-ASCII
  * regions, where per-char `A-Z → a-z` lowering agrees with
  * String.toLowerCase under this host's (non-Turkish) default locale,
  * exactly like the tokenizer behaved before. Interning additionally makes
  * downstream tag comparisons hit String.equals' identity fast path and
  * reuses the literal's cached hashCode in string-switch dispatch.
  * Pinned by NamesSpec (fast path ≡ substring+toLowerCase over every known
  * name in every case mixture, plus unknown/non-ASCII fuzz).
  */
private[html] object Names {

  private val known: Array[String] = Array(
    // tags
    "a", "abbr", "address", "area", "article", "aside", "audio", "b", "base",
    "bdo", "big", "blockquote", "body", "br", "button", "canvas", "caption",
    "center", "cite", "code", "col", "colgroup", "data", "datalist", "dd",
    "del", "details", "dfn", "dialog", "dir", "div", "dl", "dt", "em",
    "embed", "fieldset", "figcaption", "figure", "font", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup", "hr",
    "html", "i", "iframe", "img", "input", "ins", "kbd", "label", "legend",
    "li", "link", "main", "mark", "menu", "meta", "meter", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "optgroup", "option", "output",
    "p", "param", "picture", "plaintext", "pre", "progress", "q", "ruby",
    "s", "samp", "script", "section", "select", "small", "source", "span",
    "strike", "strong", "style", "sub", "summary", "sup", "svg", "table",
    "tbody", "td", "template", "textarea", "tfoot", "th", "thead", "time",
    "title", "tr", "track", "tt", "u", "ul", "var", "video", "wbr", "xmp",
    // attribute names
    "href", "class", "id", "src", "rel", "name", "content", "type", "alt",
    "width", "height", "srcset", "data-src", "data-srcset", "role", "hidden",
    "aria-hidden", "itemprop", "lang", "charset", "http-equiv", "property",
    "value", "target", "align", "bgcolor", "border", "colspan", "rowspan",
    "datatable", "checked", "poster", "media", "sizes", "loading").distinct

  private[html] def knownNames: Array[String] = known

  private val MaxLen = 12
  private val Cap = 512 // power of two, > 3× entries — probe chains stay short
  private val slots = new Array[String](Cap)
  known.foreach { s =>
    var i = s.hashCode & (Cap - 1)
    while (slots(i) != null) i = (i + 1) & (Cap - 1)
    slots(i) = s
  }

  /** Lowercased `src[start, end)` — a shared canonical instance when the
    * region ASCII-lowers to a known name, else the allocating fallback.
    */
  def lowerName(src: String, start: Int, end: Int): String = {
    val len = end - start
    if (len > MaxLen) return src.substring(start, end).toLowerCase
    // polynomial hash over the lowered chars == String.hashCode of the
    // lowered region, so the probe can compare against cached hashCodes
    var h = 0
    var i = start
    while (i < end) {
      var c = src.charAt(i)
      if (c >= 128) return src.substring(start, end).toLowerCase
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      h = h * 31 + c
      i += 1
    }
    var idx = h & (Cap - 1)
    var s = slots(idx)
    while (s != null) {
      if (s.hashCode == h && s.length == len && regionEqLower(src, start, s))
        return s
      idx = (idx + 1) & (Cap - 1)
      s = slots(idx)
    }
    src.substring(start, end).toLowerCase
  }

  private def regionEqLower(src: String, start: Int, canon: String): Boolean = {
    var i = 0
    val n = canon.length
    while (i < n) {
      var c = src.charAt(start + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c != canon.charAt(i)) return false
      i += 1
    }
    true
  }
}
