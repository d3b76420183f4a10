package graft.tools
import graft.extract._
import graft.parse.HtmlParser
import graft.select.Selectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** For each FN:base needle: was it inside the body node extract_content
  * chose (=> pruning/handlers dropped it) or outside (=> body rule too
  * narrow / wrong subtree)? */
object FnWhere {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = scala.io.Source.fromFile("/tmp/eval_triage.tsv").getLines()
      .map(_.split('\t')).filter(a => a(1) == "FN" && (a(2) == "base" || a(2) == "recall+base" || a(2) == "recall"))
      .map(a => (a(0), a(3))).toSeq
    val out = spark.createDataset(rows).map { case (file, needle) =>
      val html = HtmlParser.decodeFile(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/tests/eval", file)))
      val opts = ExtractorOptions(comments = false)
      val tree0 = HtmlParser.loadHtml(html)
      val res = try {
        if (tree0 == null) ("noparse", "", -1) else {
          graft.meta.Metadata.extractMetadata(tree0, null)
          var cleaned = graft.clean.Cleaner.treeCleaning(tree0.deepCopy, opts)
          cleaned = graft.clean.Cleaner.convertTags(cleaned, opts, null)
          def sq(s: String) = s.replaceAll("\\s+", " ")
          val inCleaned = sq(cleaned.textContent).contains(sq(needle))
          var ruleHit = -1
          var inBody = false
          var done = false
          Selectors.bodyRules.zipWithIndex.foreach { case (rule, i) =>
            if (!done) {
              val hit = Selectors.first(cleaned, rule)
              if (hit != null) {
                // approximate the cascade: this rule wins if it yields children
                ruleHit = i; inBody = sq(hit.textContent).contains(sq(needle)); done = true
              }
            }
          }
          val cat =
            if (!inCleaned) "LOST_IN_CLEANING"
            else if (ruleHit < 0) "NO_BODY_RULE"
            else if (inBody) "PRUNED_INSIDE_BODY"
            else "OUTSIDE_CHOSEN_BODY"
          (cat, file, ruleHit)
        }
      } catch { case e: Exception => ("err:" + e.getClass.getSimpleName, file, -1) }
      (res._1, res._2, needle.take(40), res._3)
    }.collect()
    out.groupBy(_._1).toSeq.sortBy(-_._2.length).foreach { case (cat, xs) =>
      println(s"WHERE $cat: ${xs.length}")
      xs.take(8).foreach(x => println(s"   ${x._2} rule=${x._4} | ${x._3}"))
    }
    spark.stop()
  }
}
