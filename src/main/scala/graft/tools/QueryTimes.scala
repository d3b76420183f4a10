package graft.tools
import org.apache.spark.sql.SparkSession
object QueryTimes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name ERROR ${e.getMessage}"); -1L }
      println(f"QT $name%-16s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
