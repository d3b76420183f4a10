package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
object FragTrace {
  def main(args: Array[String]): Unit = {
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", args(0))))
    println("head: " + html.take(80).replace("\n", " "))
    val t = HtmlParser.loadHtml(html)
    println("tree root=" + (if (t == null) "null" else t.tag))
    val r = Extraction.extract(html, null, ExtractorOptions(comments = false))
    println("result len=" + (if (r == null) -1 else r.length))
    if (r != null) println("head of result: " + r.take(200).replace("\n", " / "))
  }
}
