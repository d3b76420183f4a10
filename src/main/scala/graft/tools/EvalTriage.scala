package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** For each FN/FP needle, which pipeline variant contains it? */
object EvalTriage {
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
      def run(o: ExtractorOptions): String = {
        val r = try Extraction.extract(html, null, o) catch { case _: Exception => null }
        if (r == null) "" else r
      }
      val std  = run(ExtractorOptions(comments = false))
      val fast = run(ExtractorOptions(comments = false, fast = true))
      val rec  = run(ExtractorOptions(comments = false, recall = true))
      val prec = run(ExtractorOptions(comments = false, precision = true))
      val base = try { val t = HtmlParser.loadHtml(html); if (t == null) "" else graft.extract.Baseline.baseline(t)._2 } catch { case _: Exception => "" }
      def flags(n: String) = Seq(
        if (fast.contains(n)) "fast" else "", if (rec.contains(n)) "recall" else "",
        if (prec.contains(n)) "prec" else "", if (base.contains(n)) "base" else "")
        .filter(_.nonEmpty).mkString("+")
      expected.filterNot(std.contains).map(n => (file, "FN", flags(n), n)) ++
        unwanted.filter(std.contains).map(n => (file, "FP", flags(n), n))
    }.collect()
    val w = new java.io.PrintWriter("/tmp/eval_triage.tsv")
    diag.foreach { case (f, k, c, n) => w.println(s"$f\t$k\t$c\t${n.replace("\t"," ").replace("\n"," ")}") }
    w.close()
    println("TRIAGE " + diag.groupBy(t => t._2 + ":" + (if (t._3.isEmpty) "nowhere" else t._3)).view.mapValues(_.length).toMap.toSeq.sortBy(-_._2).mkString(" | "))
    spark.stop()
  }
}
