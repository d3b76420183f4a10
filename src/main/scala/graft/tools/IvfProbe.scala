package graft.tools

import graft.spark.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe the IVF ANN recall/cost curve at nProbe = 1..nCells against the
  * exact brute-force top-k (fitted centroids, the production configuration).
  * Evidence for the ivf_recall oracle floor and the BASELINE.md curve.
  * Usage: runMain graft.tools.IvfProbe [sfDir] */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = TextOps.annCosineTopK(emb).select(col("qid"), col("nid")).persist()
    val nExact = exact.count()
    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val t0 = System.nanoTime()
      val ivf = TextOps.annCosineIvf(emb, nCells = 16, nProbe = nProbe, fitIters = 3)
        .select(col("qid"), col("nid"))
      val hits = exact.join(ivf, Seq("qid", "nid")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"IVFPROBE sf=$sfDir nProbe=$nProbe recall=${hits.toDouble / nExact}%.3f " +
        f"n_exact=$nExact hits=$hits sec=$sec%.2f")
    }
    exact.unpersist()
    spark.stop()
  }
}
