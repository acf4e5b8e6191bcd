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

  test("checkpointed parquet sink is exactly-once across restarts") {
    val src = java.nio.file.Files.createTempDirectory("sink_src")
    val out = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString

    // Copies of the Tables-normalized staging file (fixture ts
    // encoding varies by driver round — SparkTestSession.stagedEventsFile).
    def copyFixture(name: String): Unit =
      java.nio.file.Files.copy(stagedEventsFile, src.resolve(name))

    def runPass(): Unit = {
      val q = spark.readStream.schema(stagedEventsSchema).parquet(src.toString)
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
