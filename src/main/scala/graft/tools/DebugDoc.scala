package graft.tools
import graft.extract._
import graft.parse.HtmlParser
object DebugDoc {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "changenow.de.loibl.html"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/root/reference/tests/eval", name))
    val html = HtmlParser.decodeFile(bytes)
    println(s"decoded ${html.length} chars")
    val tree = HtmlParser.loadHtml(html)
    println(s"tree=${tree} children=${if (tree != null) tree.children.map(_.tag).mkString(",") else "-"}")
    // run WITHOUT the catch to see the real error
    val opts = ExtractorOptions(comments = false)
    try {
      val r = Extraction.bareExtractionTree(tree, null, opts, withMetadata = true)
      println(s"result=${if (r == null) "NULL" else "ok len=" + r.doc.text.length}")
      if (r != null) println(r.doc.text.take(300))
    } catch { case e: Throwable =>
      println(s"EXCEPTION ${e.getClass.getName}: ${e.getMessage}")
      e.getStackTrace.take(12).foreach(s => println("  " + s))
    }
  }
}
