package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once file-sink semantics: a checkpointed streaming query
  * restarted over the same source must not reprocess or duplicate —
  * the property the reference approximates with `_id`-overwrite
  * (SURVEY.md §2.1 #4) and Spark guarantees via checkpoint + sink
  * commit log.
  */
class StreamingSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("checkpointed parquet sink is exactly-once across restarts") {
    val src = java.nio.file.Files.createTempDirectory("sink_src")
    val out = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString

    def copyFixture(name: String): Unit = java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), src.resolve(name))

    def runPass(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    val fixtureRows = Tables(spark, sf, "events").count()

    copyFixture("batch1.parquet")
    runPass()
    assert(spark.read.parquet(out).count() == fixtureRows)

    // Restart with NO new data: nothing must be reprocessed.
    runPass()
    assert(spark.read.parquet(out).count() == fixtureRows,
      "restart without new data duplicated rows")

    // New file arrives; only it is processed.
    copyFixture("batch2.parquet")
    runPass()
    assert(spark.read.parquet(out).count() == 2 * fixtureRows)
  }
}
