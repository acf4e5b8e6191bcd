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

  test("streaming HLL: per-key registers accumulate; duplicates and replays absorbed") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[streaming.TwsHll.Keyed](spark, 2)
      val q = streaming.TwsHll.distinctPerKey(input.toDS())
        .writeStream.format("memory").queryName("t_tws_hll")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        input.addData((1 to 40).map(i => streaming.TwsHll.Keyed("click", s"user_$i")) :+
          streaming.TwsHll.Keyed("view", "user_1"): _*)
        q.processAllAvailable()
        // Batch 2: 20 REPLAYED users + 10 new ones, plus a duplicate-only
        // batch for "view" — replays must not move the estimate.
        input.addData(((1 to 20) ++ (41 to 50)).map(i =>
          streaming.TwsHll.Keyed("click", s"user_$i")) :+
          streaming.TwsHll.Keyed("view", "user_1"): _*)
        q.processAllAvailable()
      } finally q.stop()

      // Sequential reference over the same cumulative value sets.
      def ref(values: Seq[String]): Long = {
        val r = functions.Hll.emptyRegisters()
        values.foreach(v => functions.Hll.addString(r, v))
        functions.Hll.estimate(r)
      }
      val rows = spark.table("t_tws_hll")
        .as[streaming.TwsHll.DistinctEst].collect()
      val batch1 = ref((1 to 40).map(i => s"user_$i"))
      val batch2 = ref((1 to 50).map(i => s"user_$i"))
      assert(rows.exists(r => r.key == "click" && r.est_distinct == batch1),
        s"batch-1 click estimate $batch1 missing in ${rows.toSeq}")
      assert(rows.exists(r => r.key == "click" && r.est_distinct == batch2),
        s"batch-2 click estimate $batch2 missing in ${rows.toSeq}")
      // view saw the same single user twice: both emissions estimate 1.
      assert(rows.filter(_.key == "view").forall(_.est_distinct == ref(Seq("user_1"))))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

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

  test("TTL'd state expires: an abandoned key re-counts from zero") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("tws_ttl").toString
      val input = MemoryStream[Event](spark, 1)
      // TTL requires TimeMode.ProcessingTime, under which the engine
      // schedules batches continuously to service time-based state:
      // processAllAvailable never quiesces and even AvailableNow does
      // not self-terminate. The deterministic drive is therefore
      // poll-the-sink-then-stop: each step starts a query off the same
      // checkpoint, waits until the expected emission appears, stops.
      // Sink is foreachBatch (the memory sink refuses checkpoint
      // recovery) collecting into a shared buffer.
      val got = new java.util.concurrent.ConcurrentLinkedQueue[TwsCounter.Seen]()
      def drainUntil(ttl: java.time.Duration, what: String)
                    (pred: TwsCounter.Seen => Boolean): Unit = {
        val q = TwsCounter.runningTotals(input.toDS(), ttl = Some(ttl))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[TwsCounter.Seen], _: Long) =>
            batch.collect().foreach(got.add)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
        try {
          val deadline = System.currentTimeMillis() + 60000
          def seen() = { import scala.jdk.CollectionConverters._; got.asScala.toSeq }
          while (!seen().exists(pred) && System.currentTimeMillis() < deadline)
            Thread.sleep(200)
          assert(seen().exists(pred), s"$what: got ${seen()}")
        } finally q.stop()
      }
      // Generous TTL: state survives the (sub-TTL) restart boundary.
      input.addData(Event(1, ts(0), 2.0))
      drainUntil(java.time.Duration.ofDays(1), "first event counts")(
        r => r.user_id == 1 && r.n_events == 1 && r.sum_value == 2.0)
      input.addData(Event(1, ts(1), 3.0))
      drainUntil(java.time.Duration.ofDays(1), "state accumulates within TTL")(
        r => r.user_id == 1 && r.n_events == 2 && r.sum_value == 5.0)
      // Re-arm the key's state under a tiny TTL (prior value, written
      // with the 1-day TTL, is still live here)...
      input.addData(Event(1, ts(2), 7.0))
      drainUntil(java.time.Duration.ofSeconds(2), "pre-expiry state still live")(
        r => r.user_id == 1 && r.n_events == 3 && r.sum_value == 12.0)
      // ...then outwait it: the key's state is reclaimed and the next
      // event re-counts from zero.
      Thread.sleep(3000)
      input.addData(Event(1, ts(3), 5.0))
      drainUntil(java.time.Duration.ofSeconds(2), "TTL-expired key re-counts from zero")(
        r => r.user_id == 1 && r.n_events == 1 && r.sum_value == 5.0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
