package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import streaming.StatefulSession
import streaming.StatefulSession.{Event, SessionOut}

/** Drives the custom flatMapGroupsWithState sessionizer through the
  * real streaming engine with MemoryStream across multiple
  * micro-batches — state must survive batch boundaries, close on gap,
  * close on the max-events business rule, and flush via event-time
  * timeout as the watermark advances.
  */
class StatefulSessionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // Offset from epoch: the initial watermark is 1970-01-01, and
  // stateful ops drop rows at/below the watermark — a ts(0) event
  // would silently vanish.
  private def ts(s: Long) = new java.sql.Timestamp((1_000_000_000L + s) * 1000)

  test("sessions close on gap, max-events cap, and watermark timeout") {
    val input = MemoryStream[Event](spark, 1)
    val sessions = StatefulSession.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
    val q = sessions.writeStream.format("memory").queryName("t_custom_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // Batch 1: user 1 has two events 60s apart (one open session);
    // user 2 emits 150 events 1s apart (cap must close at 100).
    input.addData(Seq(Event(1, ts(0), 1.0), Event(1, ts(60), 2.0)) ++
      (0 until 150).map(i => Event(2, ts(i), 1.0)))
    q.processAllAvailable()

    // Batch 2: user 1 event far past the gap → closes session 1.
    input.addData(Seq(Event(1, ts(10000), 5.0)))
    q.processAllAvailable()

    // Batch 3: watermark pushed far ahead → open sessions time out.
    input.addData(Seq(Event(99, ts(100000), 0.0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("t_custom_sessions").as[SessionOut].collect()
      .groupBy(_.user_id)

    val u1 = out(1L).sortBy(_.session_start.getTime)
    assert(u1.head.n_events == 2 && u1.head.closed_by == "gap")
    assert(u1.head.sum_value == 3.0)
    assert(u1.last.n_events == 1 && u1.last.closed_by == "timeout")

    val u2 = out(2L).sortBy(_.session_start.getTime)
    assert(u2.head.n_events == 100 && u2.head.closed_by == "max_events")
    assert(u2.last.n_events == 50 && u2.last.closed_by == "timeout")
  }
}
