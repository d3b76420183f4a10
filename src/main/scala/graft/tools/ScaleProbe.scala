package graft.tools
import graft.extract.{ExtractorOptions, TrafConfig}
import graft.spark.{DocsTables, ExtractPipeline}
import org.apache.spark.sql.SparkSession
/** Quick scaling probe: extraction throughput at several parallelism levels. */
object ScaleProbe {
  def run(cpus: Int, sfDir: String, factor: Int): (Long, Double) = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    val docs = DocsTables.docsTableScaled(spark, sfDir, factor)
      .repartition(cpus * 4, org.apache.spark.sql.functions.col("doc_id")).persist()
    docs.count() // materialize input outside the timed region
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = ExtractPipeline.extractDocs(docs, opts).filter(_.ok).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    docs.unpersist()
    spark.stop()
    runs.foreach { case (n, dt) => println(f"  sub cpus=$cpus sec=$dt%.2f") }
    runs.minBy(_._2)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    Seq(4, 16, 4, 16).foreach { c =>
      val (n, dt) = run(c, sfDir, 80)
      println(f"SCALE cpus=$c docs=$n sec=$dt%.2f tput=${n / dt}%.0f/s")
    }
  }
}
