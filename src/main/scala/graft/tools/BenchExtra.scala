package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** r06 optimization-round measurement harness (guide §1). Separate from the
  * FROZEN graft.Bench: same session shape (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, AQE on), same per-query methodology (untimed
  * sf0.001 warmup, then `runs` timed `.count()` executions, median), plus
  *  - a stage listener that prints per-stage executor time / shuffle bytes
  *    for the LAST timed run of each query (the Spark-UI drill-down, §7.1,
  *    for a headless sandbox);
  *  - a noop-sink run (§1.4) isolating full-column computation time;
  *  - `.explain("formatted")` dumped to $SPARK_GRAFT_PLANS_DIR/<q>_<tag>.txt.
  * Usage: sbt "runMain graft.tools.BenchExtra [tag] [query ...]"
  * (no query args = all declared queries). */
object BenchExtra {

  final case class StageRec(id: Int, name: String, wallMs: Long, execRunMs: Long,
      shufReadMB: Double, shufWriteMB: Double, tasks: Int)

  class Rec extends SparkListener {
    val stages = new scala.collection.mutable.ArrayBuffer[StageRec]
    var jobs = 0
    @volatile var enabled = false
    override def onJobStart(js: SparkListenerJobStart): Unit =
      if (enabled) jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (enabled) {
      val si = sc.stageInfo
      val tm = si.taskMetrics
      val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
      val graftSite = si.details.split('\n').find(l => l.contains("graft.") || l.contains("TextOps"))
        .getOrElse("").trim.take(80)
      stages.synchronized {
        stages += StageRec(si.stageId, (si.name.takeWhile(_ != '\n') + " @ " + graftSite).take(130), wall,
          if (tm == null) -1 else tm.executorRunTime,
          if (tm == null) -1 else tm.shuffleReadMetrics.totalBytesRead / 1e6,
          if (tm == null) -1 else tm.shuffleWriteMetrics.bytesWritten / 1e6,
          si.numTasks)
      }
    }
    def reset(): Unit = { stages.synchronized(stages.clear()); jobs = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val (tag, qnames) = args.toSeq match {
      case t +: rest if t.startsWith("tag=") => (t.drop(4), rest)
      case rest => ("plan", rest)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rec = new Rec
    spark.sparkContext.addSparkListener(rec)

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = if (qnames.isEmpty) all else all.filter(q => qnames.contains(q._1))
    val medians = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    picked.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"$name: warmup sf0.001")
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"WARMUP FAIL $name: ${e.getMessage}") }
      val times = (1 to runs).map { i =>
        val last = i == runs
        if (last) { rec.reset(); rec.enabled = true }
        spark.sparkContext.setJobDescription(s"$name: timed run $i")
        val cg = org.apache.spark.metrics.source.CodegenMetrics
        val c0 = cg.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        val dCompiles = cg.METRIC_COMPILATION_TIME.getCount - c0
        val meanMs = cg.METRIC_COMPILATION_TIME.getSnapshot.getMean
        print(f"  [codegen compiles=$dCompiles meanMs=$meanMs%.0f] ")
        if (last) {
          rec.enabled = false
          println(f"QX $name run$i rows=$n sec=$sec%.3f jobs=${rec.jobs}")
          val top = rec.stages.synchronized(rec.stages.sortBy(-_.execRunMs).take(8))
          top.foreach { s =>
            println(f"  stage ${s.id}%4d wall=${s.wallMs}%6dms exec=${s.execRunMs}%6dms " +
              f"sr=${s.shufReadMB}%8.2fMB sw=${s.shufWriteMB}%8.2fMB tasks=${s.tasks}%3d ${s.name}")
          }
        } else println(f"QX $name run$i rows=$n sec=$sec%.3f")
        sec
      }
      val med = graft.Bench.median(times)
      medians += ((name, med))
      // noop-sink isolation (§1.4): every column computed, no count-pruning
      spark.sparkContext.setJobDescription(s"$name: noop sink")
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"NOOP FAIL $name: ${e.getMessage}") }
      println(f"QX $name median=$med%.3f noop=${(System.nanoTime() - t0) / 1e9}%.3f")
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val txt = fn(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    println("QX TOTAL " + f"${medians.map(_._2).sum}%.3f " +
      medians.map { case (n, m) => f"$n=$m%.3f" }.mkString(" "))
    spark.stop()
  }
}
