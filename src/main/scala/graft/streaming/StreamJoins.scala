package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream equi-join bounded by an event-time interval — the
  * attribution shape (impression → click within N minutes) and the
  * last first-class Structured Streaming join surface in §2.9.
  *
  * Both sides carry watermarks, and the join condition bounds the
  * right event time to [left time, left time + window], so Spark can
  * compute exactly how long each side's state must be retained and
  * evict it — without the time bound a stream-stream inner join would
  * buffer both streams forever. State per key is bounded by
  * (watermark + window) of traffic, independent of stream length.
  */
object StreamJoins {

  /** Inner-join `left` and `right` streams on `key`, keeping pairs
    * where the right event lands within [leftTs, leftTs + window].
    * Callers must have applied `withWatermark` to BOTH inputs. The
    * timestamp columns are resolved against their own side, so both
    * streams may carry the same ts column name (the natural
    * withWatermark shape) without an ambiguous-reference failure. */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 window: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $window"))
      .drop(right(key))
}
