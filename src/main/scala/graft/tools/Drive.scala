package graft.tools
import graft.extract.{Extraction, ExtractorOptions, TrafConfig}
/** Scratch driver for manual end-to-end verification (not part of the API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val opts = ExtractorOptions(config = TrafConfig.Zero, formatting = true)
    val html = """<html><head><title>Demo — Example.org</title></head><body><article><h3>Title</h3><p><b>This here is in bold font.</b></p><div class="social-share">Share on Facebook</div></article></body></html>"""
    println("TXT  -> " + Extraction.extract(html, null, opts))
    val doc = Extraction.bareExtraction(html, null, opts)
    println("SPANS-> " + doc.spans)
    println("META -> title=" + doc.meta.title)
    val fp = Extraction.extractDoc(html, "https://example.org/a", "0001", opts)
    println("FPRNT-> " + fp.meta.fingerprint)
    println("EMPTY-> " + Extraction.extract("", null, opts))
    println("JUNK -> " + Extraction.extract("<p<<<>>&&&; <div unclosed <b>x", null, opts))
    val t0 = System.nanoTime()
    val huge = Extraction.extract("<html><body><article>" + ("<p>filler text here.</p>"*20000) + "</article></body></html>", null, opts)
    println("HUGE -> " + (if (huge == null) "null" else s"len=${huge.length}") + f" in ${(System.nanoTime()-t0)/1e9}%.2fs")
  }
}
