package graft.tools
import graft.extract._
import graft.parse.HtmlParser
object SlowDoc {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/root/reference/tests/eval")
    val opts = ExtractorOptions(precision = true, comments = false)
    val times = dir.listFiles().filter(_.getName.endsWith(".html")).map { f =>
      val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(f.toPath))
      val t0 = System.nanoTime()
      Extraction.extract(html, null, opts)
      (f.getName, (System.nanoTime() - t0) / 1e6)
    }
    times.sortBy(-_._2).take(10).foreach { case (n, ms) => println(f"SLOW $ms%10.1f ms $n") }
    println(f"SLOW total ${times.map(_._2).sum / 1000}%.1f s over ${times.length} docs")
  }
}
