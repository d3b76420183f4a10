package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.meta.Metadata
import graft.clean.Cleaner

/** Per-phase ALLOCATION profile of the kernel (bytes/doc via
  * ThreadMXBean.getThreadAllocatedBytes). The extraction job is
  * memory-bandwidth-bound at high core counts (this host saturates at
  * ~84 GB/s; per-thread bandwidth drops 2.5x from 4->16 threads), so
  * bytes/doc is the scaling currency: allocation implies TLAB-zeroing +
  * write-allocate + GC-copy DRAM traffic of ~3-5x the allocated bytes. */
object AllocProf {
  def main(args: Array[String]): Unit = {
    val text = ("word " * 60).trim
    val html = s"""<html lang="en"><head><title>Doc 42 — src3</title><meta name="author" content="Jane Doe"/></head><body><nav class="menu"><a href="/">Home</a><a href="/about">About</a></nav><div class="social-share"><a href="/share">Share</a><a href="/tweet">Tweet</a></div><div class="article-body"><p>$text</p></div><footer>Copyright Example Corp</footer></body></html>"""
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    val n = 20000
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    (1 to 5000).foreach(_ => Extraction.extractDoc(html, null, "x", opts)) // warmup
    def prof(label: String)(f: => Any): Unit = {
      val a0 = mx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val us = (System.nanoTime() - t0) / 1000.0 / n
      val kb = (mx.getThreadAllocatedBytes(tid) - a0) / 1024.0 / n
      println(f"ALLOC $label%-14s $kb%9.1f KB/doc  $us%8.1f us/doc")
    }
    prof("parse") { HtmlParser.loadHtml(html) }
    val tree = HtmlParser.loadHtml(html)
    prof("deepCopy") { tree.deepCopy }
    prof("metadata") { Metadata.extractMetadata(tree.deepCopy, null) }
    prof("clean+conv") { Cleaner.convertTags(Cleaner.treeCleaning(tree.deepCopy, opts), opts, null) }
    prof("treeClean") { Cleaner.treeCleaning(tree.deepCopy, opts) }
    prof("fingerprint") { graft.hash.SimHash.contentFingerprint("Doc 42 " + text) }
    prof("full") { Extraction.extractDoc(html, null, "x", opts) }
    println("--- metadata sub-phases (on document root) ---")
    prof("m:examine") { Metadata.examineMeta(tree) }
    prof("m:title") { Metadata.extractTitle(tree) }
    prof("m:author") { Metadata.extractAuthor(tree) }
    prof("m:url") { Metadata.extractUrl(tree, null) }
    prof("m:sitename") { Metadata.extractSitename(tree) }
    prof("m:cats") { Metadata.extractCatstags("category", tree) }
    prof("m:tags") { Metadata.extractCatstags("tag", tree) }
    prof("m:license") { Metadata.extractLicense(tree) }
    prof("m:date") { Metadata.extractDate(tree, null) }
    println("--- dom primitives ---")
    prof("d:iterList") { tree.iterList() }
    prof("d:iterList(p)") { tree.iterList(Set("p")) }
    prof("d:itertext") { tree.itertext }
    prof("d:textContent") { tree.textContent }
  }
}
