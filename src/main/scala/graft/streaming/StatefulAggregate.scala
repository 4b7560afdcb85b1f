package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom keyed state over a stream (SURVEY §2.9's "custom state"
  * surface): `mapGroupsWithState` maintaining a running per-key
  * aggregate across micro-batches. The checkpointed state store plays
  * the role the reference's monthly parquet read-modify-write plays —
  * but incremental, bounded by the key cardinality, and exactly-once.
  *
  * At scale: state is partitioned by key across executors (HDFS/RocksDB
  * state store); prefer event-time timeouts + watermarks to bound state
  * for unbounded key spaces.
  */
object StatefulAggregate {

  case class Ev(userId: Long, value: Double)
  case class UserStats(userId: Long, nEvents: Int, sumValue: Double)

  /** Running (count, sum) per user, updated each micro-batch. */
  def runningUserStats(events: Dataset[Ev]): Dataset[UserStats] = {
    implicit val stateEnc: Encoder[(Int, Double)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaDouble)
    implicit val outEnc: Encoder[UserStats] = Encoders.product[UserStats]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[(Int, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0, 0.0))
          var n = n0; var s = s0
          it.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          UserStats(user, n, s)
      }
  }
}
