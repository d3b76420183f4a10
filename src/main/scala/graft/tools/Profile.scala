package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.meta.Metadata
import graft.clean.Cleaner
/** Phase-level kernel profile over the synthetic bench page shape. */
object Profile {
  def main(args: Array[String]): Unit = {
    val text = ("word " * 60).trim
    val html = s"""<html lang="en"><head><title>Doc 42 — src3</title><meta name="author" content="Jane Doe"/></head><body><nav class="menu"><a href="/">Home</a><a href="/about">About</a></nav><div class="social-share"><a href="/share">Share</a><a href="/tweet">Tweet</a></div><div class="article-body"><p>$text</p></div><footer>Copyright Example Corp</footer></body></html>"""
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    val n = 20000
    // warmup
    (1 to 5000).foreach(_ => Extraction.extractDoc(html, null, "x", opts))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"PROF $label%-12s ${(System.nanoTime() - t0) / 1000.0 / n}%8.1f us/doc")
    }
    time("parse") { HtmlParser.loadHtml(html) }
    val tree = HtmlParser.loadHtml(html)
    time("metadata") { Metadata.extractMetadata(tree.deepCopy, null) }
    time("clean+conv") { Cleaner.convertTags(Cleaner.treeCleaning(tree.deepCopy, opts), opts, null) }
    time("deepCopy") { tree.deepCopy }
    // metadata sub-phases on a fresh copy each (copy cost ~constant)
    time("meta:examine") { graft.meta.Metadata.examineMeta(tree) }
    time("fingerprint") { graft.hash.SimHash.contentFingerprint("Doc 42 " + text) }
    time("full") { Extraction.extractDoc(html, null, "x", opts) }
  }
}
