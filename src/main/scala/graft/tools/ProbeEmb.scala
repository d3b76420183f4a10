package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r06 micro-probe: where does per-row time go in embedding stages?
  * Times noop-sink passes over embeddings with increasing expression load. */
object ProbeEmb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spark.SqlSurface.registerVecDot(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val rnd = new java.util.Random(42)
    val hyper = Array.fill(24, 4, 64)(rnd.nextGaussian())
    def dotLit(plane: Array[Double]) =
      call_function("vec_dot", col("embedding"), array(plane.map(lit): _*))
    def time(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"PROBE $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("scan", emb)
    time("unit", emb.select(col("vec_id"), call_function("vec_unit", col("embedding")).as("u")))
    time("dot4", emb.select(col("vec_id") +: (0 until 4).map(i => dotLit(hyper(0)(i)).as(s"d$i")): _*))
    time("dot96", emb.select(col("vec_id") +:
      (0 until 24).flatMap(t => (0 until 4).map(i => dotLit(hyper(t)(i)).as(s"d${t}_$i"))): _*))
    val bucketCols = (0 until 24).map { t =>
      (0 until 4).map { i => (dotLit(hyper(t)(i)) >= 0).cast("int") * lit(1 << i) }
        .reduce(_ + _).as(s"b$t")
    }
    time("buckets24", emb.select(col("vec_id") +: bucketCols: _*))
    def dotLit2(plane: Array[Double]) =
      call_function("vec_dot", col("embedding"), typedlit(plane.toSeq))
    time("dot96lit", emb.select(col("vec_id") +:
      (0 until 24).flatMap(t => (0 until 4).map(i => dotLit2(hyper(t)(i)).as(s"e${t}_$i"))): _*))
    time("tagged", emb.select(col("vec_id") +: col("embedding") +: bucketCols: _*)
      .select(col("vec_id"), posexplode(array((0 until 24).map(t => col(s"b$t")): _*))))
    spark.stop()
  }
}
