package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugEval {
  def main(args: Array[String]): Unit = {
    println("file.encoding=" + System.getProperty("file.encoding") + " jnu=" + System.getProperty("sun.jnu.encoding"))
    val names = new java.io.File("/root/reference/tests/eval").listFiles().map(_.getName).filter(_.endsWith(".html"))
    println("listed: " + names.length)
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ann = spark.read.option("multiLine","true").json("src/test/resources/evaldata.json").select(col("file"))
    val annNames = ann.collect().map(_.getString(0)).toSet
    val listed = names.toSet
    val matched = annNames.intersect(listed)
    println("ann=" + annNames.size + " matched=" + matched.size)
    val unmatchedPresent = annNames.diff(listed).toList.sorted
    println("first unmatched ann names:")
    unmatchedPresent.take(5).foreach(n => println("  ANN: [" + n + "] bytes=" + n.getBytes("UTF-8").take(40).mkString(",")))
    val unmatchedListed = listed.diff(annNames).toList.sorted
    unmatchedListed.take(5).foreach(n => println("  FS : [" + n + "] bytes=" + n.getBytes("UTF-8").take(40).mkString(",")))
    spark.stop()
  }
}
