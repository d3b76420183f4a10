package graft.parse

/** HTML character references. The parser mirrors libxml2's HTML-4 named
  * entity table (what lxml's HTMLParser decodes at parse time,
  * utils.py:44); `unescape` additionally handles the numeric forms used on
  * the output side (xml.py:283). */
object Entities {

  val named: Map[String, String] = Map(
    // XML core
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    // Latin-1 (HTML 4 set)
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢", "pound" -> "£",
    "curren" -> "¤", "yen" -> "¥", "brvbar" -> "¦", "sect" -> "§",
    "uml" -> "¨", "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
    "not" -> "¬", "shy" -> "­", "reg" -> "®", "macr" -> "¯",
    "deg" -> "°", "plusmn" -> "±", "sup2" -> "²", "sup3" -> "³",
    "acute" -> "´", "micro" -> "µ", "para" -> "¶", "middot" -> "·",
    "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º", "raquo" -> "»",
    "frac14" -> "¼", "frac12" -> "½", "frac34" -> "¾", "iquest" -> "¿",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â", "Atilde" -> "Ã",
    "Auml" -> "Ä", "Aring" -> "Å", "AElig" -> "Æ", "Ccedil" -> "Ç",
    "Egrave" -> "È", "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î", "Iuml" -> "Ï",
    "ETH" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocirc" -> "Ô", "Otilde" -> "Õ", "Ouml" -> "Ö", "times" -> "×",
    "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucirc" -> "Û",
    "Uuml" -> "Ü", "Yacute" -> "Ý", "THORN" -> "Þ", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
    "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
    "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocirc" -> "ô", "otilde" -> "õ", "ouml" -> "ö", "divide" -> "÷",
    "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "thorn" -> "þ", "yuml" -> "ÿ",
    // symbols / Greek / punctuation (HTML 4)
    "fnof" -> "ƒ", "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ",
    "Delta" -> "Δ", "Epsilon" -> "Ε", "Zeta" -> "Ζ", "Eta" -> "Η",
    "Theta" -> "Θ", "Iota" -> "Ι", "Kappa" -> "Κ", "Lambda" -> "Λ",
    "Mu" -> "Μ", "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο",
    "Pi" -> "Π", "Rho" -> "Ρ", "Sigma" -> "Σ", "Tau" -> "Τ",
    "Upsilon" -> "Υ", "Phi" -> "Φ", "Chi" -> "Χ", "Psi" -> "Ψ",
    "Omega" -> "Ω", "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "epsilon" -> "ε", "zeta" -> "ζ", "eta" -> "η",
    "theta" -> "θ", "iota" -> "ι", "kappa" -> "κ", "lambda" -> "λ",
    "mu" -> "μ", "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο",
    "pi" -> "π", "rho" -> "ρ", "sigmaf" -> "ς", "sigma" -> "σ",
    "tau" -> "τ", "upsilon" -> "υ", "phi" -> "φ", "chi" -> "χ",
    "psi" -> "ψ", "omega" -> "ω",
    "bull" -> "•", "hellip" -> "…", "prime" -> "′", "Prime" -> "″",
    "oline" -> "‾", "frasl" -> "⁄", "trade" -> "™", "euro" -> "€",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "minus" -> "−", "lowast" -> "∗", "radic" -> "√",
    "infin" -> "∞", "cap" -> "∩", "cup" -> "∪", "int" -> "∫",
    "ne" -> "≠", "equiv" -> "≡", "le" -> "≤", "ge" -> "≥",
    "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š", "scaron" -> "š",
    "Yuml" -> "Ÿ", "circ" -> "ˆ", "tilde" -> "˜",
    "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎", "rlm" -> "‏",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
    "sbquo" -> "‚", "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "lsaquo" -> "‹", "rsaquo" -> "›",
    "sum" -> "∑", "prod" -> "∏", "part" -> "∂", "exist" -> "∃",
    "empty" -> "∅", "nabla" -> "∇", "isin" -> "∈", "notin" -> "∉",
    "ni" -> "∋", "prop" -> "∝", "ang" -> "∠", "and" -> "∧",
    "or" -> "∨", "there4" -> "∴", "sim" -> "∼", "cong" -> "≅",
    "asymp" -> "≈", "sub" -> "⊂", "sup" -> "⊃", "nsub" -> "⊄",
    "sube" -> "⊆", "supe" -> "⊇", "oplus" -> "⊕", "otimes" -> "⊗",
    "perp" -> "⊥", "sdot" -> "⋅", "lceil" -> "⌈", "rceil" -> "⌉",
    "lfloor" -> "⌊", "rfloor" -> "⌋", "lang" -> "〈", "rang" -> "〉",
    "loz" -> "◊", "spades" -> "♠", "clubs" -> "♣", "hearts" -> "♥",
    "diams" -> "♦"
  )

  /** Decode `&name;` / `&#123;` / `&#x1f;` references in a string
    * (html.unescape equivalent, scoped to the table above). Unknown named
    * references are left as-is (libxml2 behavior). */
  def unescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val dec = decodeRef(s, i)
        if (dec != null) { sb.append(dec._1); i = dec._2 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Try decoding a reference at position `start` ('&'). Returns
    * (replacement, nextIndex) or null. Accepts missing trailing ';' for named
    * entities (libxml2/html.unescape legacy behavior) only when followed by a
    * non-alphanumeric char. */
  def decodeRef(s: String, start: Int): (String, Int) = {
    val n = s.length
    var i = start + 1
    if (i >= n) return null
    if (s.charAt(i) == '#') {
      i += 1
      var hex = false
      if (i < n && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) { hex = true; i += 1 }
      val digStart = i
      while (i < n && isDigitOf(s.charAt(i), hex)) i += 1
      if (i == digStart) return null
      val code = try java.lang.Long.parseLong(s.substring(digStart, i), if (hex) 16 else 10)
      catch { case _: NumberFormatException => return null }
      val end = if (i < n && s.charAt(i) == ';') i + 1 else i
      if (code <= 0 || code > 0x10ffff) return ("�", end)
      return (new String(Character.toChars(code.toInt)), end)
    }
    val nameStart = i
    while (i < n && (Character.isLetterOrDigit(s.charAt(i))) && i - nameStart < 32) i += 1
    if (i == nameStart) return null
    val name = s.substring(nameStart, i)
    named.get(name) match {
      case Some(v) if i < n && s.charAt(i) == ';' => (v, i + 1)
      case Some(v) => (v, i) // legacy, no semicolon
      case None =>
        // longest-prefix match for run-together legacy entities
        var l = name.length - 1
        while (l >= 2) {
          val sub = name.substring(0, l)
          if (named.contains(sub)) return (named(sub), nameStart + l)
          l -= 1
        }
        null
    }
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'
}
