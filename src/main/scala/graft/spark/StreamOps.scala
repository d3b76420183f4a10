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

  // --------------------------------------------------------- sessionization

  val SessionGapSec: Long = 1800 // 30 min inactivity closes a session

  /** Gap-based sessionization as a BATCH window query (lag + running sum of
    * session starts), SQL-expressible so DuckDB can verify it cell-exact.
    * Output: one row per (user, session) with event count, exact value sum
    * and epoch-second session bounds. */
  def eventSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events
      // parquet carries TIMESTAMP_NTZ; epoch math needs LTZ (session tz = UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > SessionGapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        // decimal sum: exact + order-independent, bit-identical to DuckDB
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"))
  }

  def eventSessionsOracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |), sessions AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM marked
       |)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       |  CAST(floor(min(epoch(ts))) AS BIGINT) AS start_s,
       |  CAST(floor(max(epoch(ts))) AS BIGINT) AS end_s
       |FROM sessions GROUP BY user_id, session_id""".stripMargin

  /** Streaming gap-session operator: `KeyValueGroupedDataset
    * .flatMapGroupsWithState` with per-user open-session state and an
    * EVENT-TIME timeout. A session is emitted when a later event for the
    * same user arrives past the gap, OR when the watermark passes the
    * session end + gap (the idle-session flush: a user's trailing session no
    * longer needs a successor event to be emitted). The watermark delay
    * equals the gap, so any event that could still extend an open session is
    * admitted, and the timeout timestamp (end + gap) is always ahead of the
    * watermark. Events later than the watermark delay are dropped by the
    * watermark (the documented out-of-order bound: within one micro-batch
    * events are sorted by event time; across batches, ordering is bounded by
    * the watermark). At scale, state is one small record per active user,
    * keyed-partitioned by Spark's state store; rows.toSeq buffers one user's
    * events within one micro-batch (bounded by per-user event rate x trigger
    * interval, not by history). */
  final case class SessionState(startS: Long, endS: Long, n: Long, sum: BigDecimal)
  final case class SessionOut(user_id: Long, n_events: Long, value_sum: Double,
      start_s: Long, end_s: Long)

  def streamingSessions(events: DataFrame): org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$SessionGapSec seconds")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("string"))
      .as[(Long, Long, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          var cur = state.getOption.orNull
          if (state.hasTimedOut) {
            // watermark passed end + gap: no admissible event can extend it
            if (cur != null)
              out += SessionOut(user, cur.n, cur.sum.toDouble, cur.startS, cur.endS)
            state.remove()
          } else {
            // event-time order within the micro-batch: Spark gives NO
            // per-group order guarantee here, so the group must be
            // materialized and sorted — peak memory is O(largest single-user
            // micro-batch), NOT O(stream): state carries one SessionState
            // per user regardless. A 10^5-event hot user in one batch is
            // ~10 MB transient (adversarial test pins completion + exact
            // output); bound the transient further with maxFilesPerTrigger /
            // trigger interval at ingest if hot users exceed that.
            val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            sorted.foreach { case (_, _, ts, valueStr) =>
              val tsS = ts.getTime / 1000 // floor seconds, like cast("long")
              val v = (if (valueStr == null) BigDecimal(0) else BigDecimal(valueStr))
                .setScale(2, BigDecimal.RoundingMode.HALF_UP)
              if (cur == null) cur = SessionState(tsS, tsS, 1, v)
              else if (tsS - cur.endS > SessionGapSec) {
                out += SessionOut(user, cur.n, cur.sum.toDouble, cur.startS, cur.endS)
                cur = SessionState(tsS, tsS, 1, v)
              } else cur = SessionState(cur.startS, tsS, cur.n + 1, cur.sum + v)
            }
            if (cur != null) {
              state.update(cur)
              // flush once the watermark proves no in-gap successor can come
              state.setTimeoutTimestamp((cur.endS + SessionGapSec) * 1000 + 999)
            }
          }
          out.iterator
      }
  }

  // ------------------------------------------------------- streaming dedup

  /** Streaming exact dedup over a docs stream: emit the first-seen document
    * per text fingerprint, with BOUNDED state — `dropDuplicatesWithinWatermark`
    * prunes fingerprint state once the watermark passes it, which is the
    * production shape for streaming-ingest dedup (a plain `dropDuplicates`
    * on an unbounded stream grows its state store forever). Keying follows
    * batch `TextOps.dedupExact`: two independent xxhash64s of the text
    * (16 bytes/key — seed-first chaining re-seeds the second hash), so the
    * state store never holds document text. Semantics: a duplicate arriving
    * within `delay` of the kept row's event time is dropped; one arriving
    * after the state was pruned re-emits — the standard bounded-state
    * trade-off, sized by the ingest pipeline's max duplicate lag.
    *
    * @param docs streaming DataFrame with `text` and event-time column `tsCol`
    */
  def streamingDedup(docs: DataFrame, tsCol: String = "ts",
      delay: String = "1 hour"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("h1", xxhash64(col("text")))
      .withColumn("h2", xxhash64(lit(1), col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("h1", "h2")
}
