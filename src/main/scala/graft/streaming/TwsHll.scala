package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.functions.Hll

/** Streaming distinct-count: the engine's HLL sketch as
  * `transformWithState` per-key state — the third runtime for the same
  * register arithmetic (batch compositional `llm_hll_distinct`, batch
  * native-aggregate `llm_hll_native`, and here the unbounded-stream
  * form). Per key the ValueState IS the 64-byte register buffer:
  * `handleInputRows` folds the batch's values in, the emitted estimate
  * is [[Hll.estimate]] over the accumulated registers, and state stays
  * EXACTLY 64 bytes per key forever — the property that makes
  * "distinct users per event type, ever" viable on an unbounded
  * firehose where exact distinct state grows without bound. Because
  * registers only ever max upward, replays/duplicates are absorbed for
  * free (the at-least-once-delivery bonus every idempotent sketch
  * enjoys).
  */
object TwsHll {

  case class Keyed(key: String, value: String)
  case class DistinctEst(key: String, est_distinct: Long)

  class DistinctCounter
      extends StatefulProcessor[String, Keyed, DistinctEst] {
    @transient private var regs: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getValueState[Array[Byte]]("regs", Encoders.BINARY,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Keyed],
        timerValues: TimerValues): Iterator[DistinctEst] = {
      val buf = if (regs.exists()) regs.get() else Hll.emptyRegisters()
      rows.foreach(r => if (r.value != null) Hll.addString(buf, r.value))
      regs.update(buf)
      Iterator.single(DistinctEst(key, Hll.estimate(buf)))
    }
  }

  /** Per-key running distinct estimate, one emission per key per batch
    * the key appears in (Update mode).
    */
  def distinctPerKey(rows: Dataset[Keyed]): Dataset[DistinctEst] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .transformWithState(new DistinctCounter, TimeMode.None(), OutputMode.Update())
  }
}
