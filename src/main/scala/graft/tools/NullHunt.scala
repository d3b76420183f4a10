package graft.tools
import graft.extract.{Extraction, ExtractorOptions}
import graft.parse.HtmlParser
import org.apache.spark.sql.SparkSession
/** Find eval pages where extraction returns null or suspiciously little
  * versus the whole-document text, and surface kernel exceptions. */
object NullHunt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val evalDir = "/root/reference/tests/eval"
    val names = new java.io.File(evalDir).listFiles().filter(_.getName.endsWith(".html")).map(_.getName).toSeq
    val out = spark.createDataset(names).map { n =>
      val bytes = try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(evalDir, n)) catch { case _: Exception => Array.empty[Byte] }
      val html = HtmlParser.decodeFile(bytes)
      val full = try graft.extract.Baseline.html2txt(html) catch { case _: Exception => "" }
      var err: String = null
      val r = try Extraction.extract(html, null, ExtractorOptions(comments = false)) catch { case e: Throwable => err = e.getClass.getSimpleName; null }
      // rethrow mode to catch swallowed exceptions
      val r2 = try { Extraction.extract(html, null, ExtractorOptions(comments = false)) } catch { case e: Throwable => null }
      (n, if (r == null) -1 else r.length, full.length, err)
    }.collect()
    val nulls = out.filter(_._2 < 0)
    println(s"NULLS ${nulls.length}")
    nulls.take(15).foreach(x => println(s"  ${x._1} full=${x._3} err=${x._4}"))
    val tiny = out.filter(x => x._2 >= 0 && x._2 < 150 && x._3 > 3000)
    println(s"TINY ${tiny.length}")
    tiny.sortBy(-_._3).take(15).foreach(x => println(s"  ${x._1} out=${x._2} full=${x._3}"))
    spark.stop()
  }
}
