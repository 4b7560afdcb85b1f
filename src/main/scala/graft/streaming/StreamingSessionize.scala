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
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            events.map(_.ts.getTime).toArray.sorted.foreach { t =>
              open match {
                case None => open = Some(OpenSession(t, t, 1))
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += close(s)
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
