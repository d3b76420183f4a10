package graft.tools
import graft.extract._
import graft.parse.HtmlParser
object DebugFn {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val needle = args(1)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/root/reference/tests/eval", name))
    val html = HtmlParser.decodeFile(bytes)
    println("in-html: " + html.contains(needle))
    val r = Extraction.extract(html, null, ExtractorOptions(comments = false))
    println("in-result: " + (r != null && r.contains(needle)))
    if (r != null) {
      println("result len " + r.length)
      // find the nearest context in html
      val i = html.indexOf(needle)
      if (i >= 0) println("HTML CTX: ..." + html.substring(math.max(0, i - 260), math.min(html.length, i + 80)).replace("\n", " ") + "...")
    }
  }
}
