package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
object TraceBody {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", name)))
    val tree = HtmlParser.loadHtml(html)
    val opts = ExtractorOptions(comments = false)
    // replicate the pre-extraction pipeline
    graft.meta.Metadata.extractMetadata(tree, null)
    var cleaned = graft.clean.Cleaner.treeCleaning(tree.deepCopy, opts)
    cleaned = graft.clean.Cleaner.convertTags(cleaned, opts, null)
    Selectors.bodyRules.zipWithIndex.foreach { case (rule, i) =>
      val hit = Selectors.first(cleaned, rule)
      if (hit != null)
        println(s"RULE $i -> <${hit.tag} class='${hit.get("class","")}' id='${hit.get("id","")}'> " +
          s"textLen=${hit.textContent.length} containsDisclosure=${hit.textContent.contains("This post contains references")}")
      else println(s"RULE $i -> no match")
    }
  }
}
