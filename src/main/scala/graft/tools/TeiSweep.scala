package graft.tools
import graft.extract.{Extraction, ExtractorOptions, TrafConfig}
/** TEI RelaxNG validity sweep over the full eval corpus. */
object TeiSweep {
  def main(args: Array[String]): Unit = {
    val opts = ExtractorOptions(config = TrafConfig.Zero, formatting = true, comments = true)
    val dir = new java.io.File("/root/reference/tests/eval")
    val pages = dir.listFiles().filter(_.getName.endsWith(".html")).sortBy(_.getName)
    var valid = 0
    var invalid = 0
    var none = 0
    val t0 = System.nanoTime()
    pages.foreach { f =>
      try {
        val html = graft.parse.HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(f.toPath))
        val tei = Extraction.extractTeiTree(html, null, "x", opts)
        if (tei == null) none += 1
        else if (graft.out.Tei.validateTei(tei)) valid += 1
        else { invalid += 1; if (invalid <= 10) println(s"INVALID ${f.getName}: ${graft.out.RelaxNg.teiSchema.explain(tei)}") }
      } catch { case e: Throwable => none += 1; if (none <= 5) println(s"EX ${f.getName}: ${e.getClass.getSimpleName}") }
    }
    println(f"TEISWEEP valid=$valid invalid=$invalid none=$none of ${pages.length} in ${(System.nanoTime()-t0)/1e9}%.1f s")
  }
}
