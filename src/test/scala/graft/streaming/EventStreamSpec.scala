package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1577836800000L + min * 60000L)

  test("watermarked windowed aggregation matches batch equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val rows = Seq(
      (1L, ts(0), "click", 1.0), (2L, ts(10), "click", 2.0),
      (3L, ts(65), "view", 3.0), (4L, ts(70), "click", 4.0))
    input.addData(rows: _*)
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")

    val q = EventStream.runToMemory(spark,
      EventStream.windowedCounts(events), "win_counts")
    val streamed = spark.table("win_counts")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    q.stop()

    val batch = EventStream.windowedCounts(rows.toDF("event_id", "ts", "event_type", "value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.exists(r => r(1) == "click" && r(2) == 2L)) // first hour: 2 clicks
  }

  test("streaming dedup drops duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData((1L, ts(0), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.runToMemory(spark, EventStream.dedupStream(events), "dedup_ev",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(spark.table("dedup_ev").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    q.stop()
  }

  test("sessionization state counts 30-minute-gap sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.SessionInput]
    input.addData(
      EventStream.SessionInput(7, ts(0)), EventStream.SessionInput(7, ts(5)),
      EventStream.SessionInput(7, ts(120)), EventStream.SessionInput(8, ts(1)))
    val q = EventStream.runToMemory(spark,
      EventStream.sessionize(spark, input.toDS()).toDF(), "sessions")
    val out = spark.table("sessions").as[EventStream.SessionUpdate]
      .collect().map(u => u.user_id -> (u.events, u.sessions)).toMap
    q.stop()
    assert(out(7L) == (3L, 2L)) // 2 sessions: [0,5] and [120]
    assert(out(8L) == (1L, 1L))
  }
}
