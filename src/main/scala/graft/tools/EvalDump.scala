package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dump every fn/fp needle per page to a TSV for triage. */
object EvalDump {
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
      val r = Extraction.extract(HtmlParser.decodeFile(content), null, ExtractorOptions(comments = false))
      val res = if (r == null) "" else r
      expected.filterNot(res.contains).map(n => (file, "FN", n)) ++
        unwanted.filter(res.contains).map(n => (file, "FP", n))
    }.collect()
    val w = new java.io.PrintWriter("/tmp/eval_dump.tsv")
    diag.foreach { case (f, k, n) => w.println(s"$f\t$k\t${n.replace("\t"," ").replace("\n"," ")}") }
    w.close()
    println(s"DUMP wrote ${diag.length} rows to /tmp/eval_dump.tsv")
    spark.stop()
  }
}
