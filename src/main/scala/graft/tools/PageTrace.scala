package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
/** Run the REAL pipeline on one eval page with KTRACE on; report needle. */
object PageTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val r = Extraction.extract(html, null, ExtractorOptions(comments = false))
    println("RESULT len=" + (if (r == null) -1 else r.length))
    if (args.length > 1) {
      val n = args(1)
      println("NEEDLE in result: " + (r != null && r.replaceAll("\\s+"," ").contains(n.replaceAll("\\s+"," "))))
    }
    if (r != null) println("RESULT HEAD: " + r.take(300).replace("\n"," / "))
  }
}
