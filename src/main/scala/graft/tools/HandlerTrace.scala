package graft.tools
import graft.clean.Cleaner
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
import graft.dom.{Dom, Node}
/** For one (file, needle): locate the needle's element in the pruned subtree
  * and show what handleTextelem did with it. */
object HandlerTrace {
  def sq(s: String) = s.replaceAll("\\s+", " ")
  def main(args: Array[String]): Unit = {
    val file = args(0); val needle = args(1)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val options = ExtractorOptions(comments = false)
    val tree = HtmlParser.loadHtml(html)
    graft.meta.Metadata.extractMetadata(tree, null)
    var cleanedTree = Cleaner.treeCleaning(tree, options)
    cleanedTree = Cleaner.convertTags(cleanedTree, options, null)
    var potentialTags: Set[String] = Handlers.TagCatalog ++ Set("table","td","th","tr")
    def has(n: Node) = n != null && sq(n.textContent).contains(sq(needle))
    val it = Selectors.bodyRules.iterator
    var done = false
    var idx = -1
    while (it.hasNext && !done) {
      val rule = it.next(); idx += 1
      val found = Selectors.first(cleanedTree, rule)
      if (found != null) {
        println(s"RULE $idx matched <${found.tag} class='${found.get("class","")}'> inRule=${has(found)}")
        val subtree = ContentExtractor.pruneUnwantedSections(found, potentialTags, options)
        println("after prune: " + has(subtree))
        var docRoot = subtree
        while (docRoot.parent != null) docRoot = docRoot.parent
        val ptest = docRoot.iterList(Set("p")).flatMap(_.itertext).mkString
        if (ptest.isEmpty || ptest.length < options.config.minExtractedSize * 3) {
          potentialTags = potentialTags + "div"; println("div admitted")
        }
        Dom.stripTags(subtree, "ref"); Dom.stripTags(subtree, "span")
        val resultBody = Dom.elem("body")
        var subelems = subtree.descendants(null)
        if (subelems.nonEmpty && subelems.forall(_.tag == "lb")) subelems = List(subtree)
        subelems.foreach { e =>
          val r = Handlers.handleTextelem(e, potentialTags, options)
          if (r != null) resultBody.append(r)
        }
        while (resultBody.children.nonEmpty && Handlers.NotAtTheEnd.contains(resultBody.children.last.tag))
          resultBody.remove(resultBody.children.last)
        println(s"  resultBody children=${resultBody.children.length} hasNeedle=${has(resultBody)}")
        if (resultBody.children.length > 1) done = true
        // find the element(s) whose own text/tail carries the needle
        if (done) subtree.iterList(null).foreach { e =>
          val own = (if (e.text != null) e.text else "") + " | tail: " + (if (e.tail != null) e.tail else "")
          if (sq(own).contains(sq(needle).take(25))) {
            val path = Iterator.iterate(e)(_.parent).takeWhile(_ != null)
              .map(n => n.tag + (if (n.get("class") != null) "." + n.get("class").take(18) else "")).toList.reverse.mkString("/")
            println(s"CARRIER <${e.tag}> path=$path")
            println(s"   text=${Option(e.text).getOrElse("").take(70)}")
            println(s"   tail=${Option(e.tail).getOrElse("").take(70)}")
            val r = Handlers.handleTextelem(e.deepCopy, potentialTags, options)
            println(s"   handleTextelem -> " + (if (r == null) "NULL" else s"<${r.tag}> '${r.textContent.take(60)}'"))
          }
        }
      }
    }
  }
}
