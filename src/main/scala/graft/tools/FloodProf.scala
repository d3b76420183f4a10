package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.clean.Cleaner
object FloodProf {
  def main(args: Array[String]): Unit = {
    val flood = "<i>x</i>" * 60000
    val html = s"<html><body><article><p>$flood</p></article></body></html>"
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"FLOOD $label%-14s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val tree = t("parse") { HtmlParser.loadHtml(html) }
    t("metadata") { graft.meta.Metadata.extractMetadata(tree, null) }
    val cleaned = t("clean") { Cleaner.treeCleaning(tree, opts) }
    val conv = t("convert") { Cleaner.convertTags(cleaned, opts, null) }
    val (body, _, _) = t("extract") { ContentExtractor.extractContent(conv, opts) }
    t("spans") { graft.out.Serializers.toSpans(body, null) }
    t("txt") { graft.out.Serializers.xmlToTxt(body, false) }
  }
}
