package graft.tools
import graft.clean.Cleaner
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
object RuleMatches {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val options = ExtractorOptions(comments = false)
    val tree = HtmlParser.loadHtml(html)
    graft.meta.Metadata.extractMetadata(tree, null)
    var cleanedTree = Cleaner.treeCleaning(tree, options)
    cleanedTree = Cleaner.convertTags(cleanedTree, options, null)
    Selectors.bodyRules.zipWithIndex.foreach { case (rule, i) =>
      val all = Selectors.findAll(cleanedTree, rule)
      println(s"RULE $i: ${all.length} matches")
      all.take(4).foreach(n => println(s"   <${n.tag} class='${n.get("class","")}' id='${n.get("id","")}'> textLen=${n.textContent.length}"))
    }
  }
}
