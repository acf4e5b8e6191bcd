package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import streaming.StatefulSession.Event
import streaming.TwsCounter

/** Drives the transformWithState processor (Spark 4 arbitrary-state
  * API) through the real streaming engine: typed ValueState must
  * accumulate across micro-batches on the RocksDB state store.
  */
class TwsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp((1_000_000_000L + s) * 1000)

  test("transformWithState accumulates per-key state across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark, 1)
      val q = TwsCounter.runningTotals(input.toDS())
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        input.addData(Event(1, ts(0), 2.0), Event(1, ts(1), 3.0), Event(2, ts(0), 1.0))
        q.processAllAvailable()
        input.addData(Event(1, ts(2), 5.0))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("t_tws").as[TwsCounter.Seen].collect()
      // Batch 1 emissions: user 1 -> (2, 5.0), user 2 -> (1, 1.0).
      assert(rows.exists(r => r.user_id == 1 && r.n_events == 2 && r.sum_value == 5.0))
      assert(rows.exists(r => r.user_id == 2 && r.n_events == 1 && r.sum_value == 1.0))
      // Batch 2: user 1's state carried over the batch boundary.
      assert(rows.exists(r => r.user_id == 1 && r.n_events == 3 && r.sum_value == 10.0))
      // user 2 emitted nothing in batch 2 (no input for the key).
      assert(rows.count(_.user_id == 2) == 1)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
