package graft.tools
import graft.clean.Cleaner
import graft.extract._
import graft.parse.HtmlParser
import graft.dom.Node
object Carrier {
  def sq(s: String) = s.replaceAll("\\s+", " ")
  def main(args: Array[String]): Unit = {
    val file = args(0); val pat = args(1)
    // needle looked up from the triage dump (avoids shell quoting issues)
    val needle = scala.io.Source.fromFile("/tmp/eval_triage.tsv").getLines()
      .map(_.split('\t')).filter(a => a(0) == file && a(3).contains(pat))
      .map(a => a(3)).toList.headOption.getOrElse(pat)
    println("NEEDLE: " + needle)
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val options = ExtractorOptions(comments = false)
    val tree = HtmlParser.loadHtml(html)
    graft.meta.Metadata.extractMetadata(tree, null)
    def dump(label: String, t: Node): Unit = {
      t.iterList(null).foreach { e =>
        val own = (if (e.text != null) e.text else "") + " " + (if (e.tail != null) e.tail else "")
        if (sq(own).contains(sq(needle).take(25))) {
          val path = Iterator.iterate(e)(_.parent).takeWhile(_ != null)
            .map(n => n.tag + Option(n.get("class")).map("." + _.take(24)).getOrElse("")).toList.reverse.mkString("/")
          println(s"$label CARRIER <${e.tag}> $path")
        }
      }
    }
    dump("RAW", tree)
    var cleanedTree = Cleaner.treeCleaning(tree, options)
    dump("CLEANED", cleanedTree)
    cleanedTree = Cleaner.convertTags(cleanedTree, options, null)
    dump("CONVERTED", cleanedTree)
  }
}
