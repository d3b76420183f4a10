package graft.tools
import graft.extract.{ExtractorOptions, TrafConfig}
import graft.spark.{DocsTables, ExtractPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One emulated EXECUTOR: a 4-core pinned JVM processing shard `i` of `k`
  * of the scaled docs table (filter: doc_id % k == i). Run several of these
  * concurrently on disjoint core sets to emulate an N-executor cluster —
  * separate heaps/GC per executor, exactly like spark-submit executors.
  * Prints: SHARD i/k docs=<n> sec=<s>. */
object ExecShard {
  def main(args: Array[String]): Unit = {
    val Array(i, k) = args.take(2).map(_.toInt)
    val cores = sys.env.getOrElse("SHARD_CORES", "4").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "80").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    val docs = DocsTables.docsTableScaled(spark, sfDir, factor)
      .filter(col("doc_id").cast("long") % k === i)
      .repartition(cores * 4, col("doc_id")).persist()
    docs.count()
    ExtractPipeline.extractDocs(docs.limit(500), opts).filter(_.ok).count() // warmup
    val t0 = System.nanoTime()
    val n = ExtractPipeline.extractDocs(docs, opts).filter(_.ok).count()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"SHARD $i/$k docs=$n sec=$t%.3f")
    spark.stop()
  }
}
