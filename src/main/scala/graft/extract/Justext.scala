package graft.extract

import graft.dom.{Dom, Node}

import scala.collection.mutable

/** jusText-style paragraph classifier, re-expressed from the published
  * algorithm (Pomikálek 2011; used by the reference via external.py:61-67
  * with params length_low=50, length_high=200, stopwords_low=0.1,
  * stopwords_high=0.2, max_link_density=0.2, no_headings=true).
  *
  * The stopword list is a compact multilingual union re-derived from public
  * stopword knowledge (the reference ships a 154k-word pickle we neither
  * need nor copy; the 0.1/0.2 density thresholds are coarse enough that the
  * high-frequency function words carry the decision). */
object Justext {

  final case class Paragraph(
      text: String,
      charsInLinks: Int,
      domPath: List[String]) {
    def length: Int = text.length
    def isHeading: Boolean = domPath.exists(t => t.length == 2 && t(0) == 'h' && t(1).isDigit)
    def linkDensity: Double = if (length == 0) 0 else charsInLinks.toDouble / length
  }

  val ParagraphTags: Set[String] = Set(
    "body", "blockquote", "caption", "center", "col", "colgroup", "dd",
    "div", "dl", "dt", "fieldset", "form", "legend", "optgroup", "option",
    "p", "pre", "table", "td", "textarea", "tfoot", "th", "thead", "tr",
    "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6")

  private val KillTags = Set("head", "script", "style", "iframe", "noscript", "embed")

  /** Compact multilingual function-word union (en/de/fr/es/it/pt/nl/pl/cs/
    * ru/tr/sv/da/fi + shared forms), lowercased. */
  val Stopwords: Set[String] = Set(
    // English
    "the", "a", "an", "and", "or", "but", "if", "of", "to", "in", "on", "at",
    "by", "for", "with", "about", "as", "is", "are", "was", "were", "be",
    "been", "being", "it", "its", "this", "that", "these", "those", "he",
    "she", "they", "we", "you", "i", "his", "her", "their", "our", "your",
    "not", "no", "yes", "do", "does", "did", "have", "has", "had", "will",
    "would", "can", "could", "should", "may", "might", "from", "up", "down",
    "out", "over", "under", "again", "more", "most", "some", "any", "all",
    "both", "each", "few", "other", "such", "only", "own", "same", "so",
    "than", "too", "very", "just", "there", "here", "when", "where", "why",
    "how", "what", "which", "who", "whom", "into", "through", "during",
    "before", "after", "above", "below", "between", "while", "because",
    // German
    "der", "die", "das", "den", "dem", "des", "ein", "eine", "einen",
    "einem", "einer", "eines", "und", "oder", "aber", "wenn", "von", "zu",
    "im", "am", "um", "an", "auf", "mit", "für", "ist", "sind", "war",
    "waren", "sein", "wird", "werden", "wurde", "wurden", "hat", "haben",
    "hatte", "hatten", "kann", "können", "muss", "müssen", "soll", "nicht",
    "kein", "keine", "auch", "noch", "schon", "nur", "sehr", "mehr", "als",
    "wie", "bei", "nach", "vor", "über", "unter", "zwischen", "durch",
    "gegen", "ohne", "bis", "seit", "aus", "er", "sie", "es", "wir", "ihr",
    "ich", "du", "man", "sich", "dass", "weil", "denn", "doch", "dann",
    "dieser", "diese", "dieses", "ihre", "seinem", "seiner", "ihrem",
    // French
    "le", "la", "les", "un", "une", "et", "ou", "mais", "si", "de", "du",
    "au", "aux", "dans", "sur", "sous", "avec", "pour", "par", "est", "sont",
    "était", "être", "sera", "ont", "avait", "avoir", "ne", "pas", "plus",
    "moins", "très", "aussi", "comme", "que", "qui", "quoi", "dont", "où",
    "il", "elle", "ils", "elles", "nous", "vous", "je", "tu", "on", "se",
    "sa", "son", "ses", "leur", "leurs", "ce", "cette", "ces", "cela",
    // Spanish
    "el", "los", "las", "uno", "una", "unos", "unas", "y", "o", "pero",
    "en", "con", "sin", "sobre", "entre", "hasta", "desde", "es", "son",
    "era", "eran", "ser", "fue", "ha", "han", "había", "hay", "está",
    "están", "lo", "al", "del", "se", "su", "sus", "este", "esta", "estos",
    "estas", "ese", "esa", "esos", "esas", "él", "ella", "ellos", "ellas",
    "nosotros", "yo", "tú", "usted", "también", "más", "menos", "muy",
    "cuando", "donde", "porque", "aunque", "mientras", "según",
    // Italian
    "il", "gli", "uno", "ed", "od", "ma", "di", "da", "nel", "nella",
    "con", "per", "tra", "fra", "è", "sono", "era", "erano", "essere",
    "sarà", "hanno", "aveva", "avere", "non", "più", "meno", "molto",
    "anche", "come", "che", "chi", "cui", "dove", "quando", "perché",
    "questo", "questa", "questi", "queste", "quello", "quella", "loro",
    // Portuguese
    "os", "as", "um", "uma", "uns", "umas", "e", "ao", "às", "no", "na",
    "nos", "nas", "pelo", "pela", "com", "sem", "sob", "são", "foi",
    "foram", "tem", "têm", "tinha", "não", "mais", "menos", "muito",
    "quando", "onde", "porque", "isso", "isto", "aquele", "aquela", "seu",
    "sua", "seus", "suas", "ele", "eles", "nós", "você",
    // Dutch
    "de", "het", "een", "van", "voor", "met", "op", "aan", "bij", "uit",
    "naar", "door", "onder", "tussen", "is", "zijn", "was", "waren",
    "wordt", "werd", "heeft", "hebben", "had", "hadden", "kan", "kunnen",
    "moet", "moeten", "niet", "geen", "ook", "nog", "al", "maar", "of",
    "dan", "dat", "dit", "deze", "die", "hij", "zij", "wij", "jullie",
    "ik", "je", "ze", "we", "hun", "haar", "zich", "om", "te", "er",
    // Polish
    "i", "w", "z", "na", "do", "od", "po", "za", "przez", "przy", "dla",
    "jest", "są", "był", "była", "było", "były", "być", "będzie", "ma",
    "mają", "miał", "nie", "tak", "też", "także", "tylko", "bardzo",
    "jak", "co", "kto", "gdzie", "kiedy", "dlaczego", "ponieważ", "że",
    "ten", "ta", "to", "te", "tego", "tej", "tym", "się", "jego", "jej",
    "ich", "nas", "was", "oraz", "ale", "lub", "albo", "czy", "już",
    "więc", "można", "który", "która", "które", "których",
    // Czech
    "v", "s", "k", "o", "u", "je", "jsou", "byl", "byla", "bylo", "byly",
    "být", "bude", "má", "mají", "měl", "ne", "ano", "ještě", "jen",
    "velmi", "jako", "kde", "kdy", "proč", "protože", "aby", "když",
    "tento", "tato", "toto", "jeho", "její", "jejich", "nebo", "ani",
    // Russian (Cyrillic)
    "и", "в", "на", "с", "по", "к", "у", "от", "до", "за", "из", "о",
    "об", "при", "для", "это", "этот", "эта", "эти", "тот", "та", "то",
    "те", "он", "она", "оно", "они", "мы", "вы", "я", "ты", "его", "её",
    "их", "наш", "ваш", "не", "нет", "да", "есть", "был", "была", "было",
    "были", "быть", "будет", "как", "что", "кто", "где", "когда",
    "почему", "потому", "если", "чтобы", "или", "но", "а", "же", "бы",
    "только", "очень", "уже", "ещё", "еще", "все", "всё", "так", "там",
    // Turkish
    "ve", "veya", "ama", "için", "ile", "bir", "bu", "şu", "o", "ben",
    "sen", "biz", "siz", "onlar", "değil", "var", "yok", "gibi", "kadar",
    "sonra", "önce", "çok", "daha", "en", "de", "da", "ki", "mi", "ne",
    // Scandinavian / Finnish
    "och", "att", "som", "på", "av", "är", "var", "han", "hon", "hade",
    "inte", "med", "till", "från", "men", "ett", "den", "det", "har",
    "og", "at", "som", "på", "af", "er", "til", "ikke", "jeg", "vi",
    "ja", "on", "ei", "että", "oli", "hän", "se", "ne", "mutta", "kun")

  /** Build paragraphs from a (already parsed, uncleaned) DOM tree —
    * equivalent of preprocessor + ParagraphMaker. */
  def makeParagraphs(root: Node): List[Paragraph] = {
    val paragraphs = mutable.ListBuffer.empty[Paragraph]
    val textParts = mutable.ListBuffer.empty[String]
    var charsInLinks = 0
    var linkDepth = 0
    var brCount = 0
    var path = List.empty[String]

    def flush(): Unit = {
      val text = textParts.mkString.replaceAll("\\s+", " ").trim
      if (text.nonEmpty) paragraphs += Paragraph(text, charsInLinks, path)
      textParts.clear()
      charsInLinks = 0
    }

    def addText(t: String): Unit = {
      if (t != null && t.nonEmpty) {
        val normalized = t.replaceAll("\\s+", " ")
        textParts += normalized
        if (linkDepth > 0) charsInLinks += normalized.trim.length
        brCount = 0
      }
    }

    def walk(n: Node): Unit = {
      if (KillTags.contains(n.tag)) return
      val isPara = ParagraphTags.contains(n.tag)
      if (n.tag == "br") {
        brCount += 1
        if (brCount >= 2) flush()
      } else if (isPara) {
        flush()
        path = n.tag :: path
      } else if (n.tag == "a") linkDepth += 1
      addText(n.text)
      n.children.foreach { c =>
        walk(c)
        if (c.tail != null) addText(c.tail)
      }
      if (isPara && n.tag != "br") { flush(); path = path.drop(1) }
      else if (n.tag == "a") linkDepth -= 1
    }

    walk(root)
    flush()
    paragraphs.toList
  }

  sealed trait Cls
  case object Good extends Cls
  case object Bad extends Cls
  case object Short extends Cls
  case object NearGood extends Cls

  def stopwordDensity(p: Paragraph): Double = {
    val words = p.text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) 0
    else words.count(w => Stopwords.contains(w.toLowerCase)) / words.length.toDouble
  }

  /** classify_paragraphs with trafilatura's custom params (external.py:65). */
  def classify(paragraphs: List[Paragraph],
      lengthLow: Int = 50, lengthHigh: Int = 200,
      stopwordsLow: Double = 0.1, stopwordsHigh: Double = 0.2,
      maxLinkDensity: Double = 0.2): Array[Cls] = {
    paragraphs.map { p =>
      val density = stopwordDensity(p)
      if (p.linkDensity > maxLinkDensity) Bad
      else if (p.text.contains("©") || p.text.contains("&copy")) Bad
      else if (p.domPath.contains("select") || p.domPath.contains("option")) Bad
      else if (p.length < lengthLow) {
        if (p.charsInLinks > 0) Bad else Short
      } else if (density >= stopwordsHigh) {
        if (p.length > lengthHigh) Good else NearGood
      } else if (density >= stopwordsLow) NearGood
      else Bad
    }.toArray
  }

  /** revise_paragraph_classification (context-sensitive pass). */
  def revise(paragraphs: List[Paragraph], classes: Array[Cls],
      maxHeadingDistance: Int = 200, noHeadings: Boolean = true): Array[Cls] = {
    val n = classes.length
    val cls = classes.clone()
    val ps = paragraphs.toArray

    def prevNeighbour(i: Int, ignoreNearGood: Boolean): Cls =
      neighbour(i, -1, ignoreNearGood)
    def nextNeighbour(i: Int, ignoreNearGood: Boolean): Cls =
      neighbour(i, +1, ignoreNearGood)
    def neighbour(i: Int, inc: Int, ignoreNearGood: Boolean): Cls = {
      var j = i + inc
      while (j >= 0 && j < n) {
        cls(j) match {
          case Good => return Good
          case Bad => return Bad
          case NearGood if !ignoreNearGood => return NearGood
          case _ => // skip short and (optionally) neargood
        }
        j += inc
      }
      Bad
    }

    // good headings
    if (!noHeadings) {
      var i = 0
      while (i < n) {
        if (ps(i).isHeading && cls(i) == Short) {
          var j = i + 1
          var distance = 0
          var stop = false
          while (j < n && distance <= maxHeadingDistance && !stop) {
            if (cls(j) == Good) { cls(i) = NearGood; stop = true }
            distance += ps(j).text.length
            j += 1
          }
        }
        i += 1
      }
    }

    // classify short
    val newClasses = mutable.Map.empty[Int, Cls]
    for (i <- 0 until n if cls(i) == Short) {
      val prev = prevNeighbour(i, ignoreNearGood = true)
      val next = nextNeighbour(i, ignoreNearGood = true)
      val neighbours = Set(prev, next)
      if (neighbours == Set(Good)) newClasses(i) = Good
      else if (neighbours == Set(Bad)) newClasses(i) = Bad
      else if ((prev == Bad && prevNeighbour(i, ignoreNearGood = false) == NearGood) ||
        (next == Bad && nextNeighbour(i, ignoreNearGood = false) == NearGood))
        newClasses(i) = Good
      else newClasses(i) = Bad
    }
    newClasses.foreach { case (i, c) => cls(i) = c }

    // revise neargood
    for (i <- 0 until n if cls(i) == NearGood) {
      val prev = prevNeighbour(i, ignoreNearGood = true)
      val next = nextNeighbour(i, ignoreNearGood = true)
      cls(i) = if (prev == Bad && next == Bad) Bad else Good
    }

    // more good headings
    if (!noHeadings) {
      var i = 0
      while (i < n) {
        if (ps(i).isHeading && cls(i) == Bad && classes(i) != Bad) {
          var j = i + 1
          var distance = 0
          var stop = false
          while (j < n && distance <= maxHeadingDistance && !stop) {
            if (cls(j) == Good) { cls(i) = Good; stop = true }
            distance += ps(j).text.length
            j += 1
          }
        }
        i += 1
      }
    }
    cls
  }

  /** try_justext (external.py:70-90): body of <p> elements for the
    * non-boilerplate paragraphs. */
  def tryJustext(tree: Node): Node = {
    val resultBody = Dom.elem("body")
    if (tree == null) return resultBody
    val paragraphs = makeParagraphs(tree.deepCopy)
    val cls = revise(paragraphs, classify(paragraphs))
    paragraphs.zip(cls).foreach { case (p, c) =>
      if (c == Good) {
        val elem = Dom.subElement(resultBody, "p")
        elem.text = p.text
      }
    }
    resultBody
  }
}
