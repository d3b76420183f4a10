package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe: post-execution adaptive plan + stage table of one query
  * (default pipeline_dedup) — used to identify anonymous heavy stages. */
object ProbePipe {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("pipeline_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rec = new SparkListener {
      @volatile var on = false
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (on) {
        val si = sc.stageInfo; val tm = si.taskMetrics
        println(f"PP| stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"exec=${if (tm == null) -1L else tm.executorRunTime}%6dms " +
          f"sw=${if (tm == null) -1.0 else tm.shuffleWriteMetrics.bytesWritten / 1e6}%6.2fMB " +
          si.details.split('\n').take(3).mkString(" | ").take(180))
      }
    }
    spark.sparkContext.addSparkListener(rec)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(qname)
    fn(spark, "/root/testdata/sf0.001").count() // warmup
    fn(spark, dir).count() // warm run 1
    rec.on = true
    def kc = graft.spark.ExtractPipeline.kernelDocCount.sum()
    val k0 = kc
    val df = fn(spark, dir)
    println(s"PP kernel docs during build: ${kc - k0}")
    val k1 = kc
    val t0 = System.nanoTime()
    val n = df.collect().length
    println(f"PP rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f kernelDocs=${kc - k1}")
    // SECOND action on the SAME df: if its final stage is now cheap, the
    // cache blocks exist and the first action's cost was a build/race; if
    // still expensive, the cache is never being hit from this subtree.
    val k2 = kc
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"PP second action rows=$n2 sec=${(System.nanoTime() - t1) / 1e9}%.3f kernelDocs=${kc - k2}")
    rec.on = false
    Thread.sleep(300)
    println("PP FINAL PLAN:")
    df.queryExecution.executedPlan.toString.linesIterator
      .foreach(l => println("PPP|" + l.take(170)))
    spark.stop()
  }
}
