package graft.extract

import graft.dom.{Dom, Node}
import graft.text.TextUtils.trim

import java.util.regex.Pattern
import scala.collection.mutable

/** Port of the reference's minimalistic readability fork
  * (readability_lxml.py:105-454): candidate scoring over p/pre/td parents,
  * link-density scaling, sibling collection, and the ruthless/retry loop.
  * Quirks preserved: clean_attributes is a no-op in the fork (the BAD_ATTRS
  * regex is never interpolated, readability_lxml.py:36-44), and the
  * div-to-p test matches tag *prefixes* (readability_lxml.py:82-84). */
final class Readability(var doc: Node, minTextLength: Int = 25, retryLength: Int = 250) {

  private val UnlikelyCandidates = Pattern.compile(
    "(?i)combx|comment|community|disqus|extra|foot|header|menu|remark|rss|shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|tweet|twitter")
  private val OkMaybeCandidate = Pattern.compile("(?i)and|article|body|column|main|shadow")
  private val PositiveRe = Pattern.compile(
    "(?i)article|body|content|entry|hentry|main|page|pagination|post|text|blog|story")
  private val NegativeRe = Pattern.compile(
    "(?i)combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget")
  private val VideoRe = Pattern.compile("(?i)https?://(www\\.)?(youtube|vimeo)\\.com")
  private val DotSpace = Pattern.compile("\\.( |$)")

  private val DivScores = Set("div", "article")
  private val BlockScores = Set("pre", "td", "blockquote")
  private val BadElemScores = Set("address", "ol", "ul", "dl", "dd", "dt", "li", "form", "aside")
  private val StructureScores = Set("h1", "h2", "h3", "h4", "h5", "h6", "th", "header", "footer", "nav")
  private val FrameTags = Set("body", "html")
  private val ListTags = Set("ol", "ul")
  private val TagA = Set("a")
  private val TagInput = Set("input")
  // the regex '<(a|blockquote|dl|div|img|ol|p|pre|table|ul)' matches prefixes
  private val DivToPPrefix = List("a", "blockquote", "dl", "div", "img", "ol", "p", "table", "ul")

  private final class Candidate(var score: Double, val elem: Node)

  private def textLength(elem: Node): Int = {
    elem.trimmedTextLength
  }

  private def tags(node: Node, tagNames: String*): List[Node] =
    tagNames.toList.flatMap(t => node.descendants(Set(t)))

  private def classWeight(elem: Node): Double = {
    var weight = 0.0
    List(elem.get("class"), elem.get("id")).filter(a => a != null && a.nonEmpty).foreach { attribute =>
      if (NegativeRe.matcher(attribute).find()) weight -= 25
      if (PositiveRe.matcher(attribute).find()) weight += 25
    }
    weight
  }

  private def scoreNode(elem: Node): Candidate = {
    var score = classWeight(elem)
    val name = elem.tag.toLowerCase
    if (DivScores.contains(name)) score += 5
    else if (BlockScores.contains(name)) score += 3
    else if (BadElemScores.contains(name)) score -= 3
    else if (StructureScores.contains(name)) score -= 5
    new Candidate(score, elem)
  }

  private def getLinkDensity(elem: Node): Double = {
    val total = math.max(textLength(elem), 1)
    val linkLength = elem.descendants(TagA).map(textLength).sum
    linkLength.toDouble / total
  }

  private def removeUnlikelyCandidates(): Unit = {
    doc.descendants(null).foreach { elem =>
      if (elem.parent != null && elem.attachedTo(doc)) {
        val attrs = List(elem.get("class"), elem.get("id"))
          .filter(a => a != null && a.nonEmpty).mkString(" ")
        if (attrs.length >= 2 && !FrameTags.contains(elem.tag) &&
          UnlikelyCandidates.matcher(attrs).find() &&
          !OkMaybeCandidate.matcher(attrs).find())
          Dom.dropTree(elem)
      }
    }
  }

  private def transformMisusedDivs(): Unit = {
    tags(doc, "div").foreach { elem =>
      // prefix-matching serialization regex (readability_lxml.py:322-325):
      // search over the children's serialized subtrees
      val hasBlock = elem.children.exists(child =>
        child.iterList(null).exists(d => DivToPPrefix.exists(p => d.tag.startsWith(p))))
      if (!hasBlock) elem.tag = "p"
    }
    tags(doc, "div").foreach { elem =>
      if (elem.text != null && elem.text.trim.nonEmpty) {
        val pElem = Dom.elem("p")
        pElem.text = elem.text
        elem.text = null
        elem.insert(0, pElem)
      }
      // reversed enumerate
      elem.children.zipWithIndex.toList.reverse.foreach { case (child, pos) =>
        if (child.tail != null && child.tail.trim.nonEmpty) {
          val pElem = Dom.elem("p")
          pElem.text = child.tail
          child.tail = null
          elem.insert(pos + 1, pElem)
        }
        if (child.tag == "br") Dom.dropTree(child)
      }
    }
  }

  private def scoreParagraphs(): (java.util.IdentityHashMap[Node, Candidate], List[Node]) = {
    val candidates = new java.util.IdentityHashMap[Node, Candidate]()
    val ordered = mutable.ListBuffer.empty[Node]
    tags(doc, "p", "pre", "td").foreach { elem =>
      val parentNode = elem.getparent
      if (parentNode != null) {
        val grandParent = parentNode.getparent
        val elemText = Option(trim(elem.textContent)).getOrElse("")
        val elemTextLen = elemText.length
        if (elemTextLen >= minTextLength) {
          if (!candidates.containsKey(parentNode)) {
            candidates.put(parentNode, scoreNode(parentNode))
            ordered += parentNode
          }
          if (grandParent != null && !candidates.containsKey(grandParent)) {
            candidates.put(grandParent, scoreNode(grandParent))
            ordered += grandParent
          }
          val score = 1 + elemText.split(",", -1).length + math.min(elemTextLen / 100.0, 3.0)
          candidates.get(parentNode).score += score
          if (grandParent != null) candidates.get(grandParent).score += score / 2
        }
      }
    }
    ordered.foreach { elem =>
      val c = candidates.get(elem)
      c.score *= (1 - getLinkDensity(elem))
    }
    (candidates, ordered.toList)
  }

  private def selectBestCandidate(candidates: List[Candidate]): Candidate = {
    if (candidates.isEmpty) return null
    candidates.sortBy(c => -c.score).head
  }

  private def getArticle(candidates: java.util.IdentityHashMap[Node, Candidate],
      best: Candidate): Node = {
    val siblingScoreThreshold = math.max(10.0, best.score * 0.2)
    val output = Dom.elem("div")
    val parent = best.elem.getparent
    val siblings = if (parent != null) parent.children.toList else List(best.elem)
    siblings.foreach { sibling =>
      var append = false
      if (sibling eq best.elem) append = true
      else if (candidates.containsKey(sibling) &&
        candidates.get(sibling).score >= siblingScoreThreshold) append = true
      else if (sibling.tag == "p") {
        val linkDensity = getLinkDensity(sibling)
        val nodeContent = if (sibling.text != null) sibling.text else ""
        val nodeLength = nodeContent.length
        if (nodeLength > 80 && linkDensity < 0.25) append = true
        else if (nodeLength <= 80 && linkDensity == 0 && DotSpace.matcher(nodeContent).find())
          append = true
      }
      if (append) output.append(sibling)
    }
    output
  }

  /** Debug: one ruthless scoring pass, print top candidates. */
  def debugDump(): Unit = {
    tags(doc, "script", "style").foreach(i => if (i.parent != null) Dom.dropTree(i))
    removeUnlikelyCandidates()
    transformMisusedDivs()
    val (candidates, ordered) = scoreParagraphs()
    println(s"DBG candidates=${ordered.length}")
    ordered.map(candidates.get).sortBy(c => -c.score).take(8).foreach { c =>
      println(f"DBG  cand <${c.elem.tag} class=${c.elem.get("class","")} id=${c.elem.get("id","")}> score=${c.score}%.1f textLen=${textLength(c.elem)}")
    }
  }

  /** summary() (readability_lxml.py:133-173): returns the cleaned article
    * tree (the reference serializes + reparses; clean_attributes is a no-op). */
  def summary(): Node = {
    var ruthless = true
    while (true) {
      tags(doc, "script", "style").foreach(i => if (i.parent != null) Dom.dropTree(i))
      tags(doc, "body").foreach(_.set("id", "readabilityBody"))
      if (doc.tag == "body") doc.set("id", "readabilityBody")
      if (ruthless) removeUnlikelyCandidates()
      transformMisusedDivs()
      val (candidates, ordered) = scoreParagraphs()
      val best = selectBestCandidate(ordered.map(candidates.get))
      var article: Node = null
      if (best != null) article = getArticle(candidates, best)
      else {
        if (ruthless) {
          ruthless = false
        } else {
          article = doc.findDescendant("body")
          if (article == null) article = doc
        }
      }
      if (article != null) {
        val cleaned = sanitize(article, candidates)
        val articleLength = textLength(cleaned)
        if (ruthless && articleLength < retryLength) {
          ruthless = false
        } else return cleaned
      }
    }
    null // unreachable
  }

  private val TextCleanElems = Set("p", "img", "li", "a", "embed", "input")

  private def sanitize(node: Node,
      candidates: java.util.IdentityHashMap[Node, Candidate]): Node = {
    tags(node, "h1", "h2", "h3", "h4", "h5", "h6").foreach { header =>
      if (header.parent != null &&
        (classWeight(header) < 0 || getLinkDensity(header) > 0.33)) Dom.dropTree(header)
    }
    tags(node, "form", "textarea").foreach(e => if (e.parent != null) Dom.dropTree(e))
    tags(node, "iframe").foreach { e =>
      if (e.get("src") != null && VideoRe.matcher(e.get("src")).find()) e.text = "VIDEO"
      else if (e.parent != null) Dom.dropTree(e)
    }
    val allowed = java.util.Collections.newSetFromMap(new java.util.IdentityHashMap[Node, java.lang.Boolean]())
    List("table", "ul", "div", "aside", "header", "footer", "section").foreach { tagName =>
      node.descendants(Set(tagName)).reverse.foreach { elem =>
        if (!allowed.contains(elem) && (elem.attachedTo(node))) {
          val weight = classWeight(elem)
          var score = if (candidates.containsKey(elem)) candidates.get(elem).score else 0.0
          if (weight + score < 0) {
            Dom.dropTree(elem)
          } else if (elem.textContent.count(_ == ',') < 10) {
            var toRemove = false
            val counts = mutable.Map.empty[String, Int]
            TextCleanElems.foreach(k => counts(k) = elem.descendants(Set(k)).length)
            counts("li") -= 100
            counts("input") -= elem.descendants(TagInput).count(_.get("type") == "hidden")
            val contentLength = textLength(elem)
            val linkDensity = getLinkDensity(elem)
            val parentNode = elem.getparent
            if (parentNode != null)
              score = if (candidates.containsKey(parentNode)) candidates.get(parentNode).score else 0.0
            if (counts("p") > 0 && counts("img") > 1 + counts("p") * 1.3) toRemove = true
            else if (counts("li") > counts("p") && !ListTags.contains(elem.tag)) toRemove = true
            else if (counts("input") > counts("p") / 3.0) toRemove = true
            else if (contentLength < minTextLength && counts("img") == 0) toRemove = true
            else if (contentLength < minTextLength && counts("img") > 2) toRemove = true
            else if (weight < 25 && linkDensity > 0.2) toRemove = true
            else if (weight >= 25 && linkDensity > 0.5) toRemove = true
            else if ((counts("embed") == 1 && contentLength < 75) || counts("embed") > 1) toRemove = true
            else if (contentLength == 0) {
              toRemove = true
              // sibling rescue (readability_lxml.py:423-441)
              val sibLengths = mutable.ListBuffer.empty[Int]
              var sib = elem.getnext
              var foundNext = false
              while (sib != null && !foundNext) {
                val l = textLength(sib)
                if (l > 0) { sibLengths += l; foundNext = true }
                sib = sib.getnext
              }
              val limit = sibLengths.length + 1
              sib = elem.getprevious
              var done = false
              while (sib != null && !done) {
                val l = textLength(sib)
                if (l > 0) {
                  sibLengths += l
                  if (sibLengths.length >= limit) done = true
                }
                sib = sib.getprevious
              }
              if (sibLengths.nonEmpty && sibLengths.sum > 1000) {
                toRemove = false
                tags(elem, "table", "ul", "div", "section").foreach(allowed.add)
              }
            }
            if (toRemove && elem.parent != null) Dom.dropTree(elem)
          }
        }
      }
    }
    doc = node
    node
  }
}

object Readability {
  /** try_readability (external.py:37-46). */
  def tryReadability(htmlTree: Node): Node = {
    try {
      new Readability(htmlTree, minTextLength = 25, retryLength = 250).summary()
    } catch {
      case _: StackOverflowError => Dom.elem("div")
      case scala.util.control.NonFatal(_) => Dom.elem("div")
    }
  }
}
