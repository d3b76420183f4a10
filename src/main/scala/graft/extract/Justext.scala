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

  /** Full multilingual jusText stopword union (the corpus-derived public
    * jusText wordlists, all languages combined — the same data the reference
    * loads via external.py:49-58; shipped as a gzip word-list resource).
    * Loaded once per JVM; ~154k lowercase words. */
  lazy val Stopwords: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/jt_stopwords.txt.gz")
    if (in == null) sys.error("jt_stopwords.txt.gz resource missing")
    val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.util.zip.GZIPInputStream(in), java.nio.charset.StandardCharsets.UTF_8))
    val b = Set.newBuilder[String]
    var line = rd.readLine()
    while (line != null) { if (line.nonEmpty) b += line; line = rd.readLine() }
    rd.close()
    b.result()
  }

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
