package graft

import graft.extract.{ExtractorOptions, TrafConfig}
import graft.spark.{DocsTables, ExtractPipeline}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "extract":{"docs":N,"docs_per_sec":...},
  *  "scaling":{"cpus_lo":8,"cpus_hi":32,"docs_per_sec_lo":...,
  *             "docs_per_sec_hi":...,"efficiency":...}}
  *
  * The scaling block is the sandbox evidence for the north rule's N vs 4N
  * criterion (BASELINE.md): the identical extraction job over identical
  * input at local[8] vs local[32]; efficiency = tput_hi / (4 * tput_lo). */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def extractionRun(spark: SparkSession, sfDir: String, factor: Int): (Long, Double) = {
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    val docs = DocsTables.docsTableScaled(spark, sfDir, factor)
    val t0 = System.nanoTime()
    val n = ExtractPipeline.extractDocsSkewAware(docs, opts).filter(_.ok).count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // extraction throughput at the requested parallelism; the workload is
    // sized so the low-parallelism run is tens of seconds of real kernel
    // work — small runs measure job-fixed overhead, not scaling
    val nDocsBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val factor = math.max(1, (400000 / math.max(1L, nDocsBase)).toInt)
    val (docsN, extractSec) = extractionRun(spark, sfDir, factor)
    val tput = docsN / extractSec

    // scaling evidence: identical job, identical input, local[8] vs local[32]
    spark.stop()
    val loCpus = 8
    val hiCpus = 32
    spark = session(loCpus)
    val (nLo, tLo) = extractionRun(spark, sfDir, factor)
    spark.stop()
    spark = session(hiCpus)
    val (nHi, tHi) = extractionRun(spark, sfDir, factor)
    spark.stop()
    val tputLo = nLo / tLo
    val tputHi = nHi / tHi
    val efficiency = tputHi / ((hiCpus.toDouble / loCpus) * tputLo)

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,""" +
        f""""extract":{"docs":$docsN,"sec":$extractSec%.3f,"docs_per_sec":$tput%.1f},""" +
        f""""scaling":{"cpus_lo":$loCpus,"cpus_hi":$hiCpus,"docs":$nLo,""" +
        f""""sec_lo":$tLo%.3f,"sec_hi":$tHi%.3f,"docs_per_sec_lo":$tputLo%.1f,""" +
        f""""docs_per_sec_hi":$tputHi%.1f,"efficiency":$efficiency%.3f}}""")
  }
}
