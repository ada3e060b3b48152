package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join — the last of Structured Streaming's three join
  * shapes (windowed agg and stream-static live in [[Sessionize]]):
  * click→purchase attribution, matching each purchase to the clicks
  * of the same user within the preceding `windowMinutes`.
  *
  * Both sides carry a watermark and the join condition carries the
  * event-time RANGE — together they bound the join state: a click is
  * dropped from state once the watermark passes click_ts +
  * windowMinutes, so state tracks the attribution horizon, not the
  * stream's lifetime (the only formulation that survives an unbounded
  * stream). Inner-join output emits as matches arrive — no
  * finalization wait — so replay sentinels need no special handling
  * beyond their event_type never matching either side's filter.
  */
object StreamJoin {

  def attribution(events: DataFrame, windowMinutes: Int = 30,
                  watermark: String = "2 hours"): DataFrame = {
    def side(eventType: String, pfx: String) =
      events.filter(col("event_type") === eventType)
        .select(col("event_id").as(s"${pfx}_id"),
          col("user_id").as(s"${pfx}_user"),
          col("ts").cast("timestamp").as(s"${pfx}_ts"))
        .withWatermark(s"${pfx}_ts", watermark)
    side("click", "click")
      .join(side("purchase", "purchase"),
        col("click_user") === col("purchase_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("click_user").as("user_id"),
        col("purchase_id"))
  }
}
