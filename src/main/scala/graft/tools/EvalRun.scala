package graft.tools
import graft.spark.EvalCorpus
import org.apache.spark.sql.SparkSession
/** Manual eval-corpus scoring runner (quality vs published baseline). */
object EvalRun {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "standard"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = EvalCorpus.score(spark, "/root/reference/tests/eval",
      "src/test/resources/evaldata.json", mode)
    println(s"EVAL[$mode] $s")
    spark.stop()
  }
}
