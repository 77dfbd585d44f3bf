package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {

  import EventStreams._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L / 3600000 * 3600000 + minute * 60000L)

  test("hourly windowed aggregation runs incrementally with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("hourly_out").trigger(Trigger.AvailableNow()).start()

    input.addData(
      Event(ts(5), 1L, "click", 1.0),
      Event(ts(10), 2L, "click", 2.0),
      Event(ts(65), 1L, "view", 3.0),
      // watermark pushes past hour 0 only with a much later event
      Event(ts(300), 3L, "click", 4.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly_out").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // hour 0 (2 clicks) and hour 1 (1 view) are closed by the watermark
    assert(out.contains(("click", 2L, 3.0)))
    assert(out.contains(("view", 1L, 3.0)))
  }

  test("stateful sessionization emits one summary per closed session") {
    implicit val s = spark
    import spark.implicits._
    val events = Seq(
      Event(ts(0), 1L, "a", 1.0),
      Event(ts(2), 1L, "a", 1.0),
      Event(ts(30), 1L, "a", 1.0), // > 5 min gap: new session
      Event(ts(31), 1L, "a", 1.0),
      Event(ts(90), 1L, "a", 1.0), // third session (still open, not emitted)
      Event(ts(1), 2L, "b", 1.0)).toDS()
    val sessions = sessionize(events, gapMs = 5 * 60000L).collect()
    val u1 = sessions.filter(_.userId == 1L).sortBy(_.startMs)
    assert(u1.length == 2)
    assert(u1(0).nEvents == 2 && u1(0).startMs == ts(0).getTime)
    assert(u1(1).nEvents == 2 && u1(1).startMs == ts(30).getTime)
    // user 2's single run stays open -> nothing emitted
    assert(!sessions.exists(_.userId == 2L))
  }
}
