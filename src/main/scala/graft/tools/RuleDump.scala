package graft.tools
import graft.clean.Cleaner
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
import graft.dom.{Dom, Node}
/** Dump the matched rule subtree and resulting body for one page. */
object RuleDump {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val options = ExtractorOptions(comments = false)
    val tree = HtmlParser.loadHtml(html)
    graft.meta.Metadata.extractMetadata(tree, null)
    var cleanedTree = Cleaner.treeCleaning(tree, options)
    cleanedTree = Cleaner.convertTags(cleanedTree, options, null)
    var potentialTags: Set[String] = Handlers.TagCatalog ++ Set("table","td","th","tr")
    val it = Selectors.bodyRules.iterator
    var done = false; var idx = -1
    while (it.hasNext && !done) {
      val rule = it.next(); idx += 1
      val found = Selectors.first(cleanedTree, rule)
      if (found != null) {
        println(s"== RULE $idx -> <${found.tag} class='${found.get("class","")}' id='${found.get("id","")}'>")
        val subtree = ContentExtractor.pruneUnwantedSections(found, potentialTags, options)
        var docRoot = subtree; while (docRoot.parent != null) docRoot = docRoot.parent
        val ptest = docRoot.iterList(Set("p")).flatMap(_.itertext).mkString
        if (ptest.isEmpty || ptest.length < options.config.minExtractedSize * 3) potentialTags = potentialTags + "div"
        Dom.stripTags(subtree, "ref"); Dom.stripTags(subtree, "span")
        println("SUBTREE: " + Dom.toXml(subtree).take(900))
        val resultBody = Dom.elem("body")
        var subelems = subtree.descendants(null)
        if (subelems.nonEmpty && subelems.forall(_.tag == "lb")) subelems = List(subtree)
        subelems.foreach { e =>
          val r = Handlers.handleTextelem(e, potentialTags, options)
          if (r != null) resultBody.append(r)
        }
        while (resultBody.children.nonEmpty && Handlers.NotAtTheEnd.contains(resultBody.children.last.tag))
          resultBody.remove(resultBody.children.last)
        println(s"RESULT children=${resultBody.children.length}: " + Dom.toXml(resultBody).take(600))
        if (resultBody.children.length > 1) done = true
      }
    }
  }
}
