package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: cache-build behavior of a persisted minhash signature
  * table layered on the persisted shingle corpus. Phases timed separately
  * with per-stage executor time, to answer (a) does sigs.count() build the
  * sigs cache, (b) what do the band-side reads cost afterwards. */
object ProbeSig {
  class Rec extends SparkListener {
    @volatile var label = ""
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val tm = si.taskMetrics
      println(f"PS| [$label] stage ${si.stageId} tasks=${si.numTasks} " +
        f"exec=${if (tm == null) -1L else tm.executorRunTime}ms " +
        f"${si.name.takeWhile(_ != '\n').take(60)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.spark.SqlSurface.registerVecDot(spark)

    def phase[T](name: String)(f: => T): T = {
      rec.label = name
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200) // let stage-completed events drain
      println(f"PROBESIG $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warmup at sf0.001 (JIT, codegen)
    graft.SparkEntry.queries("dedup_minhash")(spark, "/root/testdata/sf0.001").count()
    graft.spark.TextOps.releaseCaches()

    val docs = graft.spark.DocsTables.documents(spark, dir)
    import graft.spark.TextOps.{nearDupCorpus, hashedShingles}
    val corpus = nearDupCorpus(docs)
      .select(col("doc_id"), array_sort(hashedShingles(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val sigs = corpus.select(col("doc_id"),
      call_function("minhash128", col("sh")).as("mh")).persist()

    phase("sigs.count.1")(sigs.count())
    phase("sigs.count.2")(sigs.count())
    phase("bands.one_side") {
      sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(31)),
          b => hash(slice(col("mh"), b * 4 + 1, lit(4))))).as(Seq("band", "bhash")))
        .count()
    }
    phase("bands.again") {
      sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(31)),
          b => hash(slice(col("mh"), b * 4 + 1, lit(4))))).as(Seq("band", "bhash")))
        .count()
    }
    phase("corpus.count")(corpus.count())
    sigs.unpersist(true); corpus.unpersist(true)
    graft.spark.TextOps.releaseCaches()
    // now the bench pattern: repeated full invocations
    (1 to 3).foreach { i =>
      phase(s"full.dedup_minhash.$i") {
        graft.SparkEntry.queries("dedup_minhash")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
