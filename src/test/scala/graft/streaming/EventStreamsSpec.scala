package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {

  import EventStreams._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L / 3600000 * 3600000 + minute * 60000L)

  test("hourly windowed aggregation runs incrementally with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // explicit micro-batches: the watermark computed at the end of one
    // batch only closes windows in the NEXT batch, so emission needs a
    // batch after the watermark-pushing event (AvailableNow may stop
    // before that follow-up batch runs)
    val q = hourlyCounts(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("hourly_out").start()
    input.addData(
      Event(ts(5), 1L, "click", 1.0),
      Event(ts(10), 2L, "click", 2.0),
      Event(ts(65), 1L, "view", 3.0))
    q.processAllAvailable()
    // pushes the watermark past hours 0 and 1...
    input.addData(Event(ts(300), 3L, "click", 4.0))
    q.processAllAvailable()
    // ...and this batch emits the windows the new watermark closed
    input.addData(Event(ts(301), 3L, "click", 5.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly_out").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // hour 0 (2 clicks) and hour 1 (1 view) are closed by the watermark
    assert(out.contains(("click", 2L, 3.0)))
    assert(out.contains(("view", 1L, 3.0)))
  }

  test("streaming dedup within watermark drops re-delivered events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // default trigger: AvailableNow would terminate after the first batch
    val q = dedupWithinWatermark(input.toDF(), "ts", "1 hour",
      "userId", "eventType")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    input.addData(
      Event(ts(1), 1L, "click", 1.0),
      Event(ts(1), 1L, "click", 1.0), // same-batch duplicate
      Event(ts(2), 2L, "view", 2.0))
    q.processAllAvailable()
    input.addData(
      Event(ts(3), 1L, "click", 9.0), // re-delivery in a later batch
      Event(ts(4), 3L, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect()
      .map(r => (r.getLong(1), r.getString(2))).toList
    assert(out.length == 3, out.toString)
    assert(out.toSet == Set((1L, "click"), (2L, "view"), (3L, "click")))
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

  test("stream-stream interval join attributes clicks within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = attributeClicks(
      views.toDF().toDF("event_id", "user_id", "ts"),
      clicks.toDF().toDF("event_id", "user_id", "ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()

    views.addData((100L, 1L, ts(0)), (101L, 2L, ts(0)))
    clicks.addData(
      (200L, 1L, ts(5)),  // within 10 min of view 100 -> attributed
      (201L, 1L, ts(20)), // past the horizon -> dropped
      (202L, 3L, ts(2)))  // no matching view -> dropped
    q.processAllAvailable()
    // a later batch can still match an earlier view inside the horizon
    clicks.addData((203L, 2L, ts(9)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attr_out").select("view_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 200L), (101L, 203L)),
      s"wrong attribution set: $out")
  }
}
