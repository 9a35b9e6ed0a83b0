package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import java.sql.Timestamp

/** Structured Streaming operators over the `events` stream shape
  * `(event_id, ts, user_id, event_type, value, props)`.
  *
  * The reference has NO streaming surface (SURVEY.md §2.C); these operators
  * extend the engine for continuous ingestion of transcript/event feeds:
  * watermarked tumbling-window aggregation, streaming dedup, and custom
  * sessionization state via mapGroupsWithState. Each streaming transform has
  * a batch-equivalent used by the DuckDB oracle (q_stream_window_batch).
  */
object EventStream {

  /** Watermarked tumbling-window aggregation — the canonical streaming agg.
    * Late rows beyond `watermark` are dropped; state is bounded. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    graft.Tuning.sessionDefaults(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 4).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming exact dedup on event_id within the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionInput(user_id: Long, ts: Timestamp)
  final case class SessionUpdate(user_id: Long, events: Long, sessions: Long)
  final case class SessionState(events: Long, sessions: Long, lastTs: Long)

  /** Custom per-key state: counts events and 30-minute-gap sessions per user
    * (KeyValueGroupedDataset.mapGroupsWithState with processing-time
    * timeout — the engine's arbitrary-stateful-operator surface). */
  def sessionize(spark: SparkSession, events: Dataset[SessionInput]): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessionState(0, 0, Long.MinValue))
          sorted.foreach { r =>
            val t = r.ts.getTime
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapMs
            st = SessionState(st.events + 1, st.sessions + (if (newSession) 1 else 0), t)
          }
          state.update(st)
          SessionUpdate(user, st.events, st.sessions)
      }
  }

  /** Run a streaming DataFrame to completion against a memory sink (used by
    * tests; production would write to a real sink with checkpointing).
    *
    * Non-Append runs skip watermark-only ("no-data") micro-batches: those
    * batches exist to flush state during lulls — in Append mode they emit
    * the final windows of a bounded input and MUST stay on, but in Update/
    * Complete mode an empty batch cannot change the emitted rows (Update
    * emits only on aggregate change, Complete re-emits the same result)
    * while still re-running the full stateful aggregation across every
    * state partition (opt r06, StreamProbe: 0.6–0.8 s of the 1.6 s
    * streaming bench entry was this one empty batch). The conf is captured
    * by the query at start() (the stream clones the session state), so the
    * session value is restored immediately after — concurrent/later Append
    * queries see the stock setting. EventStreamSpec's batch-equivalence
    * assertions run under this path. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Update()): StreamingQuery = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val skipNoData = outputMode != OutputMode.Append()
    val prior = spark.conf.getOption(key)
    if (skipNoData) spark.conf.set(key, "false")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .start()
      q.processAllAvailable()
      q
    } finally {
      if (skipNoData) prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
