package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Categorize FN needles: absent-from-decoded-html vs dropped-by-cascade vs
  * present-in-baseline (meaning our cascade chose the wrong branch). */
object EvalCat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val evalDir = "/root/reference/tests/eval"
    val ann = spark.read.option("multiLine","true").json("src/test/resources/evaldata.json")
      .select(col("file"), col("with").as("expected"), col("without").as("unwanted"))
    val names = new java.io.File(evalDir).listFiles().filter(_.getName.endsWith(".html")).map(_.getName).toSeq
    val pages = spark.createDataset(names).map { n =>
      (n, try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(evalDir, n)) catch { case _: Exception => Array.empty[Byte] })
    }.toDF("file","content")
    val joined = ann.join(pages, Seq("file")).as[(String, Seq[String], Seq[String], Array[Byte])]
    val diag = joined.flatMap { case (file, expected, unwanted, content) =>
      val html = HtmlParser.decodeFile(content)
      val r = Extraction.extract(html, null, ExtractorOptions(comments = false))
      val res = if (r == null) "" else r
      // whole-document text (html2txt): does the needle survive parsing at all?
      val everything = try graft.extract.Baseline.html2txt(html) catch { case _: Exception => "" }
      // collapse whitespace for a looser presence check
      def sq(s: String) = s.replaceAll("\\s+", " ")
      val every = sq(everything)
      expected.filterNot(res.contains).map { n =>
        val cat =
          if (every.contains(sq(n))) "DROPPED"      // parsed fine, cascade lost it
          else if (sq(html).contains(sq(n))) "TEXTLOST" // in raw html but not in html2txt
          else "ABSENT"                              // not even in decoded html (charset/entity)
        (file, "FN", cat, n)
      } ++ unwanted.filter(res.contains).map(n => (file, "FP", "KEPT", n))
    }.collect()
    val w = new java.io.PrintWriter("/tmp/eval_cat.tsv")
    diag.foreach { case (f, k, c, n) => w.println(s"$f\t$k\t$c\t${n.replace("\t"," ").replace("\n"," ")}") }
    w.close()
    println("CAT " + diag.groupBy(t => t._2 + ":" + t._3).view.mapValues(_.length).toMap)
    spark.stop()
  }
}
