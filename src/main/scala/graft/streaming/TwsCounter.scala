package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Arbitrary stateful processing on the MODERN API: Spark 4's
  * `transformWithState` (StatefulProcessor + typed state variables +
  * RocksDB state store) — the successor to `flatMapGroupsWithState`
  * that [[StatefulSession]] demonstrates. Both are kept: fMGWS is the
  * widely-deployed form, TWS is where new custom-state operators
  * should land (schema'd state variables, TTL, timers, state
  * evolution).
  *
  * The operator: a per-user running event counter + value total with
  * per-batch emission — the building block of rate limiting / velocity
  * checks over an event firehose. State per key is O(1) (two scalars
  * in a ValueState), the state store is RocksDB (bounded memory +
  * changelog checkpointing at scale), and TTL is configured so an
  * abandoned key's state is reclaimed — the three properties that keep
  * arbitrary state viable on a 100 TB/day stream.
  */
object TwsCounter {

  case class Seen(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-key running (count, sum) emitted every batch the key appears.
    * `ttl` is the production state-reclamation knob: an expired key's
    * value is invisible to `exists()`/`get()` and physically cleaned by
    * the store, so an abandoned key re-counts from zero if it ever
    * returns — what keeps per-key state bounded on a 100 TB/day
    * firehose. TTL requires TimeMode.ProcessingTime, under which the
    * engine schedules batches CONTINUOUSLY to service time-based state
    * (a busy loop under Trigger.ProcessingTime(0): `processAllAvailable`
    * never quiesces — observed at ~16k empty micro-batches — and even
    * Trigger.AvailableNow does not self-terminate). A long-running
    * production stream doesn't care; a bounded driver (spec, backfill)
    * polls the sink for the expected emission and stops the query —
    * how TwsSpec drives expiry deterministically.
    */
  class RunningTotals(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, StatefulSession.Event, Seen] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        ttl)

    override def handleInputRows(
        key: Long,
        rows: Iterator[StatefulSession.Event],
        timerValues: TimerValues): Iterator[Seen] = {
      val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var s = s0
      rows.foreach { e => n += 1; s += e.value }
      totals.update((n, s))
      Iterator.single(Seen(key, n, s))
    }
  }

  /** Wire the processor into a (streaming or batch) typed Dataset.
    * Requires the RocksDB state store provider in streaming mode —
    * see TwsSpec for the session conf. With `ttl` set the state runs
    * under TimeMode.ProcessingTime (required for TTL) and each key's
    * value expires `ttl` after its last update.
    */
  def runningTotals(events: Dataset[StatefulSession.Event],
                    ttl: Option[java.time.Duration] = None): Dataset[Seen] = {
    import events.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotals(cfg), mode, OutputMode.Update())
  }
}
