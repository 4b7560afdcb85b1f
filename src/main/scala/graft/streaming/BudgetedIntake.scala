package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming per-source token-budget intake on Spark 4's
  * arbitrary-state API (`transformWithState` + `StatefulProcessor`) —
  * the successor to `mapGroupsWithState` with typed, individually
  * evolvable state variables (Value/List/Map), per-state TTL and
  * timers, backed by the RocksDB state store.
  *
  * Use case: a training-data collection run caps how many tokens each
  * SOURCE may contribute (the streaming form of the mixture-sampling
  * knob — see llm.Sampling.mixtureKeep for the batch form). State is
  * one Long per source (the running accepted-token count): documents
  * stream in, each source accepts documents until its budget is
  * exhausted, everything after is dropped — across micro-batches,
  * exactly-once, resumable from the checkpoint.
  *
  * At scale: state is partitioned by key across executors and lives in
  * RocksDB (off-heap, spillable), so the operator is bounded by
  * #sources × 8 bytes — nothing grows with the stream. A TTL on the
  * counter (TTLConfig) would implement a ROLLING budget (tokens/day)
  * with no further code.
  */
object BudgetedIntake {

  case class Doc(source: String, docId: Long, nTokens: Long)
  case class Accepted(source: String, docId: Long, cumTokens: Long)

  /** Accepts docs while the source's running token count is below
    * `budget` (the doc that crosses the line is still accepted —
    * greedy intake, same contract as first-fit packing's final bin). */
  class TokenBudgetProcessor(budget: Long)
      extends StatefulProcessor[String, Doc, Accepted] {
    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cumTokens", Encoders.scalaLong,
                                          TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[Doc],
                                 timerValues: TimerValues): Iterator[Accepted] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = Seq.newBuilder[Accepted]
      rows.foreach { doc =>
        if (c < budget) {
          c += doc.nTokens
          out += Accepted(source, doc.docId, c)
        }
      }
      cum.update(c)
      out.result().iterator
    }
  }

  /** Streaming intake: one state variable per source, Append output.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def budgetedIntake(docs: Dataset[Doc], budget: Long): Dataset[Accepted] = {
    implicit val outEnc: Encoder[Accepted] = Encoders.product[Accepted]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    docs.groupByKey(_.source)
      .transformWithState(new TokenBudgetProcessor(budget),
                          TimeMode.None(), OutputMode.Append())
  }
}
