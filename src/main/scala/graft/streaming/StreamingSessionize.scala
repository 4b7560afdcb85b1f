package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization (§2.9): the streaming twin of the batch
  * gap-sessionize (q44 — identical gap semantics), built on
  * `flatMapGroupsWithState` with an EVENT-TIME timeout.
  *
  * A session is a maximal run of a user's events with no gap larger
  * than `gapMinutes`. Closure happens in two places, both emitted in
  * Append mode:
  *  - IN-BATCH: an event further than the gap from the open session
  *    closes it immediately (the fold below);
  *  - ACROSS BATCHES: if a user goes quiet, the state times out when
  *    the watermark passes open-end + gap, and the timeout callback
  *    emits the session (`hasTimedOut` branch — this is why flatMap,
  *    not map: a call can emit 0..n sessions).
  *
  * At scale: state is one small fixed-size record per ACTIVE user
  * (partitioned across the state store), and the watermark bounds how
  * long a quiet user's record lives — state size tracks concurrent
  * activity, not corpus history.
  */
object StreamingSessionize {

  case class Click(userId: Long, ts: Timestamp)
  case class OpenSession(startMs: Long, endMs: Long, n: Int)
  case class Session(userId: Long, startTs: Timestamp, endTs: Timestamp,
                     nEvents: Int)

  def closedSessions(clicks: Dataset[Click], gapMinutes: Int): Dataset[Session] = {
    val spark = clicks.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    clicks
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
                              GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[Click], state: GroupState[OpenSession]) =>
          def close(s: OpenSession): Session =
            Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // Full interval merge of (open-session span) + (this batch's
            // points): out-of-order events admitted behind the open
            // session must LOWER its start (and an intermediate point
            // may bridge two runs), so a last-interval-only fold over
            // raw arrival order is not enough — q44's batch semantics
            // are "gap over the sorted sequence" and this reproduces
            // them over what streaming retains (the span + new points).
            val intervals =
              (state.getOption.toSeq ++
                events.map(c => OpenSession(c.ts.getTime, c.ts.getTime, 1)).toSeq)
                .sortBy(_.startMs)
            if (intervals.isEmpty) Iterator.empty
            else {
              val merged = scala.collection.mutable.ArrayBuffer(intervals.head)
              intervals.tail.foreach { iv =>
                val last = merged.last
                if (iv.startMs - last.endMs <= gapMs)
                  merged(merged.length - 1) = OpenSession(last.startMs,
                    math.max(last.endMs, iv.endMs), last.n + iv.n)
                else merged += iv
              }
              val open = merged.last
              // a session whose close time the watermark already passed
              // can never be extended — close it now instead of setting
              // an in-the-past timeout (which Spark rejects)
              if (open.endMs + gapMs > state.getCurrentWatermarkMs()) {
                state.update(open)
                state.setTimeoutTimestamp(open.endMs + gapMs)
                merged.init.iterator.map(close)
              } else {
                state.remove()
                merged.iterator.map(close)
              }
            }
          }
      }
  }
}
