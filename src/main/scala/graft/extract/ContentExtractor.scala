package graft.extract

import graft.clean.Cleaner
import graft.dom.{Dom, Node}
import graft.select.Selectors
import graft.text.TextUtils

/** Document-level extraction cascade (core.py:483-653). */
object ContentExtractor {

  /** prune_unwanted_sections (core.py:504-528). */
  def pruneUnwantedSections(treeIn: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    var tree = Cleaner.pruneUnwantedNodes(treeIn, Selectors.overallDiscardRules, withBackup = true)
    tree = Cleaner.pruneUnwantedNodes(tree, Selectors.paywallDiscardRules)
    if (!potentialTags.contains("graphic"))
      tree = Cleaner.pruneUnwantedNodes(tree, Selectors.discardImageRules)
    if (!options.recall) {
      tree = Cleaner.pruneUnwantedNodes(tree, Selectors.teaserDiscardRules)
      if (options.precision)
        tree = Cleaner.pruneUnwantedNodes(tree, Selectors.precisionDiscardRules)
    }
    tree = Cleaner.deleteByLinkDensity(tree, "div", backtracking = true, options.precision, options)
    tree = Cleaner.deleteByLinkDensity(tree, "list", backtracking = false, options.precision, options)
    tree = Cleaner.deleteByLinkDensity(tree, "p", backtracking = false, options.precision, options)
    if (options.precision) {
      while (tree.children.nonEmpty && tree.children.last.tag == "head")
        tree.remove(tree.children.last)
      tree = Cleaner.deleteByLinkDensity(tree, "head", backtracking = false, favorPrecision = false, options)
      tree = Cleaner.deleteByLinkDensity(tree, "quote", backtracking = false, favorPrecision = false, options)
    }
    tree
  }

  /** recover_wild_text (core.py:483-501). */
  def recoverWildText(tree: Node, resultBody: Node, options: ExtractorOptions,
      potentialTagsIn: Set[String]): (Node, Set[String]) = {
    var potentialTags = potentialTagsIn
    var searchTags = Set("blockquote", "code", "p", "pre", "q", "quote", "table")
    if (options.recall) {
      potentialTags = potentialTags ++ Set("div", "lb")
      searchTags = searchTags ++ Set("div", "lb", "list")
    }
    val searchTree = pruneUnwantedSections(tree, potentialTags, options)
    if (!potentialTags.contains("ref")) Dom.stripTags(searchTree, "a", "ref", "span")
    else Dom.stripTags(searchTree, "span")
    val subelems = searchTree.descendants(null).filter(e =>
      searchTags.contains(e.tag) ||
        (e.tag == "div" && e.get("class", "").contains("w3-code")))
    subelems.foreach { e =>
      KernelBudget.check()
      val r = Handlers.handleTextelem(e, potentialTags, options)
      if (r != null) resultBody.append(r)
    }
    (resultBody, potentialTags)
  }

  /** extract_content (core.py:531-604). Returns (body, text, len). */
  def extractContent(tree: Node, options: ExtractorOptions): (Node, String, Int) = {
    val backupTree = tree.deepCopy
    var resultBody = Dom.elem("body")
    var potentialTags: Set[String] = Handlers.TagCatalog
    if (options.tables) potentialTags = potentialTags ++ Set("table", "td", "th", "tr")
    if (options.images) potentialTags = potentialTags + "graphic"
    if (options.links) potentialTags = potentialTags + "ref"

    val it = Selectors.bodyRules.iterator
    var matched = false
    while (it.hasNext && !matched) {
      val rule = it.next()
      val found = Selectors.first(tree, rule)
      if (found != null) {
        var subtree = pruneUnwantedSections(found, potentialTags, options)
        if (potentialTags.contains("table") || options.precision) {
          subtree.iterList(Set("table")).foreach { elem =>
            if (elem.attachedTo(subtree) && Cleaner.linkDensityTestTables(elem) && elem.parent != null)
              elem.parent.remove(elem)
          }
        }
        if (subtree.children.nonEmpty) {
          // `//p//text()` is document-absolute in the reference (core.py:565)
          var docRoot = subtree
          while (docRoot.parent != null) docRoot = docRoot.parent
          // `//p//text()` length only — sum textContentLength over p nodes
          // (nested p double-count matches the flatMap(_.itertext) form)
          var ptestLen = 0
          docRoot.foreachNode(n => if (n.tag == "p") ptestLen += n.textContentLength)
          val factor = if (options.recall) 5 else if (options.precision) 1 else 3
          if (ptestLen == 0 || ptestLen < options.config.minExtractedSize * factor)
            potentialTags = potentialTags + "div"
          if (!potentialTags.contains("ref")) Dom.stripTags(subtree, "ref")
          if (!potentialTags.contains("span")) Dom.stripTags(subtree, "span")
          // proper extraction over a snapshot (lxml descendant list)
          var subelems = subtree.descendants(null)
          if (subelems.nonEmpty && subelems.forall(_.tag == "lb")) subelems = List(subtree)
          subelems.foreach { e =>
            KernelBudget.check()
            val r = Handlers.handleTextelem(e, potentialTags, options)
            if (r != null) resultBody.append(r)
          }
          while (resultBody.children.nonEmpty && Handlers.NotAtTheEnd.contains(resultBody.children.last.tag))
            resultBody.remove(resultBody.children.last)
          if (resultBody.children.length > 1) matched = true
          KTrace.log(s"body rule <${found.tag} class=${found.get("class","")}> children=${resultBody.children.length} matched=$matched")
        }
      }
    }
    var tempText = stripPy(resultBody.itertext.mkString(" "))
    if (resultBody.children.isEmpty || tempText.length < options.config.minExtractedSize) {
      KTrace.log(s"wild text recovery: children=${resultBody.children.length} len=${tempText.length}")
      val (rb, _) = recoverWildText(backupTree, resultBody, options, potentialTags)
      resultBody = rb
      tempText = stripPy(resultBody.itertext.mkString(" "))
    }
    Dom.stripElements(resultBody, "done")
    Dom.stripTags(resultBody, "div")
    (resultBody, tempText, tempText.length)
  }

  private def stripPy(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && TextUtils.isPyWhitespace(s.charAt(a))) a += 1
    while (b > a && TextUtils.isPyWhitespace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** process_comments_node (core.py:607-618). */
  def processCommentsNode(elem: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    if (potentialTags.contains(elem.tag)) {
      val processed = Handlers.handleTextnode(elem, options, commentsFix = true)
      if (processed != null) { processed.clearAttrs(); return processed }
    }
    null
  }

  /** extract_comments (core.py:621-653). Returns (commentsBody, text, len) —
    * the input tree is mutated (matched subtree removed). */
  def extractComments(tree: Node, options: ExtractorOptions): (Node, String, Int) = {
    val commentsBody = Dom.elem("body")
    val potentialTags: Set[String] = Handlers.TagCatalog
    val it = Selectors.commentsRules.iterator
    var break = false
    while (it.hasNext && !break) {
      val rule = it.next()
      val found = Selectors.first(tree, rule)
      if (found != null) {
        val subtree = Cleaner.pruneUnwantedNodes(found, Selectors.commentsDiscardRules)
        Dom.stripTags(subtree, "a", "ref", "span")
        subtree.descendants(null).foreach { e =>
          val r = processCommentsNode(e, potentialTags, options)
          if (r != null) commentsBody.append(r)
        }
        if (commentsBody.children.nonEmpty) {
          if (subtree.parent != null) subtree.parent.remove(subtree)
          break = true
        }
      }
    }
    val tempComments = stripPy(commentsBody.itertext.mkString(" "))
    (commentsBody, tempComments, tempComments.length)
  }
}
