package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface beyond the extraction kernel: watermarked
  * windowed aggregation over the events stream (late data bounded by the
  * watermark; state pruned automatically). The extraction transform itself
  * is streaming-compatible (SparkSpec's docs-stream test). */
object StreamOps {

  /** Windowed event counts/sums with a watermark — the canonical streaming
    * aggregation shape (readStream -> watermark -> window agg). */
  def windowedEventStats(events: DataFrame,
      watermark: String = "10 minutes", window: String = "5 minutes"): DataFrame = {
    events
      // parquet written by pandas carries TIMESTAMP_NTZ; watermarks need LTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), round(col("total_value"), 4).as("total_value"))
  }

  /** Batch equivalent for oracle/inspection parity. */
  def windowedEventStatsBatch(spark: SparkSession, sfDir: String): DataFrame =
    windowedEventStats(spark.read.parquet(s"$sfDir/events.parquet"))
}
