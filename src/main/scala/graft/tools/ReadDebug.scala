package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.dom.{Dom, Node}
object ReadDebug {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val tree = HtmlParser.loadHtml(html)
    graft.meta.Metadata.extractMetadata(tree, null)
    val backup = tree.deepCopy
    val bt = graft.clean.Cleaner.pruneUnwantedNodes(backup, graft.select.Selectors.paywallDiscardRules)
    // inline summary with candidate dump
    val rd = new Readability(bt.deepCopy, 25, 250)
    rd.debugDump()
    val r = Readability.tryReadability(bt)
    val txt = graft.text.TextUtils.trim(r.textContent)
    println("READ len=" + (if (txt == null) 0 else txt.length))
    println("READ out: " + Dom.toXml(r).take(500))
  }
}
