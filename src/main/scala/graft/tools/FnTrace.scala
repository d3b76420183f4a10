package graft.tools
import graft.clean.Cleaner
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
import graft.dom.{Dom, Node}
import org.apache.spark.sql.SparkSession
/** Step-level trace: for each FN, the first pipeline step that loses it. */
object FnTrace {
  def sq(s: String) = s.replaceAll("\\s+", " ")
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = scala.io.Source.fromFile("/tmp/eval_triage.tsv").getLines()
      .map(_.split('\t')).filter(a => a(1) == "FN")
      .map(a => (a(0), a(3))).toSeq
    val out = spark.createDataset(rows).map { case (file, needle) =>
      (file, needle.take(50), trace(file, needle))
    }.collect()
    out.groupBy(_._3).toSeq.sortBy(-_._2.length).foreach { case (step, xs) =>
      println(s"STEP $step: ${xs.length}")
      xs.take(6).foreach(x => println(s"   ${x._1} | ${x._2}"))
    }
    spark.stop()
  }
  def trace(file: String, needle: String): String = try {
    val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/eval", file)))
    val options = ExtractorOptions(comments = false)
    val tree = HtmlParser.loadHtml(html)
    if (tree == null) return "noparse"
    def has(n: Node) = n != null && sq(n.textContent).contains(sq(needle))
    if (!has(tree)) return "not_in_parse"
    graft.meta.Metadata.extractMetadata(tree, null)
    val treeBackup1 = tree.deepCopy
    var cleanedTree = Cleaner.treeCleaning(tree, options)
    if (!has(cleanedTree)) return "tree_cleaning"
    val cleanedTreeBackup = cleanedTree.deepCopy
    cleanedTree = Cleaner.convertTags(cleanedTree, options, null)
    if (!has(cleanedTree)) return "convert_tags"
    // extract_content with instrumented pruning on the chosen rule
    var potentialTags: Set[String] = Handlers.TagCatalog ++ Set("table","td","th","tr")
    val it = Selectors.bodyRules.iterator
    var resultBody = Dom.elem("body")
    var ruleIdx = -1
    var lostAt: String = null
    var i = -1
    var matched = false
    while (it.hasNext && !matched) {
      val rule = it.next(); i += 1
      val found = Selectors.first(cleanedTree, rule)
      if (found != null) {
        val inRule = has(found)
        // instrumented pruneUnwantedSections
        var t = found
        var localLost: String = null
        def step(name: String)(f: Node => Node): Unit = {
          if (localLost == null) { t = f(t); if (inRule && !has(t)) localLost = name }
        }
        step("overall_discard")(x => Cleaner.pruneUnwantedNodes(x, Selectors.overallDiscardRules, withBackup = true))
        step("paywall_discard")(x => Cleaner.pruneUnwantedNodes(x, Selectors.paywallDiscardRules))
        step("teaser_discard")(x => Cleaner.pruneUnwantedNodes(x, Selectors.teaserDiscardRules))
        step("linkdensity_div")(x => Cleaner.deleteByLinkDensity(x, "div", backtracking = true, false, options))
        step("linkdensity_list")(x => Cleaner.deleteByLinkDensity(x, "list", backtracking = false, false, options))
        step("linkdensity_p")(x => Cleaner.deleteByLinkDensity(x, "p", backtracking = false, false, options))
        if (localLost == null) {
          t.iterList(Set("table")).foreach { elem =>
            if (elem.attachedTo(t) && Cleaner.linkDensityTestTables(elem) && elem.parent != null)
              elem.parent.remove(elem)
          }
          if (inRule && !has(t)) localLost = "table_linkdensity"
        }
        val subtree = t
        if (subtree.children.nonEmpty) {
          var docRoot = subtree
          while (docRoot.parent != null) docRoot = docRoot.parent
          val ptest = docRoot.iterList(Set("p")).flatMap(_.itertext).mkString
          if (ptest.isEmpty || ptest.length < options.config.minExtractedSize * 3)
            potentialTags = potentialTags + "div"
          Dom.stripTags(subtree, "ref")
          Dom.stripTags(subtree, "span")
          if (localLost == null && inRule && !has(subtree)) localLost = "strip_ref_span"
          var subelems = subtree.descendants(null)
          if (subelems.nonEmpty && subelems.forall(_.tag == "lb")) subelems = List(subtree)
          subelems.foreach { e =>
            val r = Handlers.handleTextelem(e, potentialTags, options)
            if (r != null) resultBody.append(r)
          }
          while (resultBody.children.nonEmpty && Handlers.NotAtTheEnd.contains(resultBody.children.last.tag))
            resultBody.remove(resultBody.children.last)
          if (resultBody.children.length > 1) {
            matched = true; ruleIdx = i
            if (localLost == null && inRule && !has(resultBody)) localLost = "handlers"
            if (inRule) lostAt = localLost
            else lostAt = "outside_rule" + i
          }
        }
      }
    }
    if (!matched) return "no_rule_matched"
    if (lostAt == null && has(resultBody)) {
      // lost later: compare_extraction or render
      val tempText = resultBody.itertext.mkString(" ").trim
      val r = Extraction.compareExtraction(cleanedTreeBackup, treeBackup1, resultBody, tempText, tempText.length, options)
      if (!has(r._1)) return "compare_extraction"
      return "render/serialize"
    }
    if (lostAt == null) "in_body_unknown" else lostAt
  } catch { case e: Exception => "err:" + e.getClass.getSimpleName }
}
