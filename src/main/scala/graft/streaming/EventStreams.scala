package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape. The reference
  * has no event-time streaming (SURVEY §2B: its "streaming" is pull-based
  * Arrow batching), so this module is the engine's extension surface:
  * the same hourly aggregation `events_hourly` computes in batch, as an
  * incremental watermark + window plan, plus stateful sessionization.
  *
  * At 100 TB / cluster scale these plans shuffle once per window on
  * (window, event_type) and keep per-key state bounded by the watermark.
  */
object EventStreams {

  final case class Event(ts: java.sql.Timestamp, userId: Long,
      eventType: String, value: Double)

  final case class SessionSummary(userId: Long, nEvents: Long,
      startMs: Long, endMs: Long)

  /** Hourly windowed aggregation with a 2-hour watermark for late data. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("eventType"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("eventType"),
        col("cnt"), col("sum_value"))

  /** Streaming deduplication by key within the watermark: the state
    * store keeps one entry per key only until the watermark passes it,
    * so memory stays bounded by the late-data horizon instead of growing
    * with the stream — the streaming member of the dedup family
    * (exact/fingerprint/MinHash cover the batch side).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream interval join: every view pairs with the
    * same user's clicks landing within `horizon` AFTER it — streaming
    * click attribution, the incremental form of the batch events_funnel
    * probe. Both inputs carry watermarks and the join condition bounds
    * click.ts to [view.ts, view.ts + horizon], so Spark derives state
    * eviction for BOTH sides (a view older than watermark + horizon can
    * never match again and is dropped from the state store; clicks
    * likewise) — join state is bounded by the late-data horizon times
    * traffic rate, never by stream history. One shuffle per side, on
    * user_id, the equi-half of the condition.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", "1 hour").alias("v")
    val c = clicks.withWatermark("ts", "1 hour").alias("c")
    v.join(c, expr(
        s"v.user_id = c.user_id AND c.ts >= v.ts " +
          s"AND c.ts <= v.ts + interval $horizon"))
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"), col("v.ts").as("view_ts"),
        col("c.event_id").as("click_id"), col("c.ts").as("click_ts"))
  }

  /** Gap-based sessionization: a session closes after `gapMs` of
    * inactivity per user; emits one summary row per closed session.
    */
  def sessionize(events: Dataset[Event], gapMs: Long)(
      implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[List[Long], SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[List[Long]]) =>
          val stamps = (state.getOption.getOrElse(Nil) ++
            rows.map(_.ts.getTime)).sorted
          // close every maximal run with gaps <= gapMs except the last
          // (which may still grow); batch-mode calls see all data at once
          val sessions = stamps.foldLeft(List.empty[List[Long]]) {
            case (acc, t) => acc match {
              case (cur @ (last :: _)) :: rest if t - last <= gapMs =>
                (t :: cur) :: rest
              case _ => List(t) :: acc
            }
          }.map(_.reverse).reverse
          state.update(sessions.lastOption.getOrElse(Nil).reverse)
          sessions.dropRight(1).map(s =>
            SessionSummary(userId, s.size.toLong, s.head, s.last)).iterator
      }
  }
}
