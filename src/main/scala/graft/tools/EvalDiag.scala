package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Per-doc eval diagnostics: list pages with false negatives/positives. */
object EvalDiag {
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
    val diag = joined.map { case (file, expected, unwanted, content) =>
      val r = Extraction.extract(HtmlParser.decodeFile(content), null, ExtractorOptions(comments = false))
      val res = if (r == null) "" else r
      val fns = expected.filterNot(res.contains)
      val fps = unwanted.filter(res.contains)
      (file, fns.size, fps.size, fps.take(2).mkString(" || "), r == null)
    }.collect()
    val totalFn = diag.map(_._2).sum
    val totalFp = diag.map(_._3).sum
    println(s"DIAG total fn=$totalFn fp=$totalFp nulls=${diag.count(_._5)}")
    diag.filter(_._3 > 0).sortBy(-_._3).take(15).foreach { case (f, fn, fp, ex, isNull) =>
      println(f"DIAG $fn%2d fn $fp%2d fp $f%-48s")
    }
    spark.stop()
  }
}
