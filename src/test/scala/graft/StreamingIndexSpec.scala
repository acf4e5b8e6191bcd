package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone: the reference's bulk-import pipeline run CONTINUOUSLY —
  * a stream of incoming rows bulk-upserted into an IndexStore index
  * via foreachBatch, each micro-batch an idempotent keyed merge. This
  * is the Structured-Streaming form of `BulkProcessImpl.writeMysqlDataToES`
  * (SURVEY.md §3.1): micro-batches instead of 200k-row buffers,
  * checkpoint instead of cursor position, `_id` upsert via
  * last-write-wins merge.
  */
class StreamingIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("streaming foreachBatch bulk-upsert into IndexStore") {
    val srcDir = java.nio.file.Files.createTempDirectory("stream_idx_src")
    val store = new etl.IndexStore(spark,
      java.nio.file.Files.createTempDirectory("stream_idx_wh").toString)

    def stage(name: String): Unit = java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), srcDir.resolve(name))

    def runPass(): Unit = {
      val ckpt = srcDir.resolve(".ckpt").toString
      val q = spark.readStream.schema(eventsSchema).parquet(srcDir.toString)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (store.listIndexes().contains("events"))
            store.upsert(batch, "events", "event_id")
          else store.bulkImport(batch, "events", "event_id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }

    val distinctIds = Tables(spark, sf, "events")
      .select("event_id").distinct().count()

    stage("b1.parquet")
    runPass()
    assert(store.count("events") == distinctIds)

    // Second file = full duplicate of the stream (late replay):
    // upsert semantics must keep the count stable.
    stage("b2.parquet")
    runPass()
    assert(store.count("events") == distinctIds,
      "replayed duplicates must upsert, not append")
    assert(store.read("events").select("event_id").distinct().count() == distinctIds)
  }
}
