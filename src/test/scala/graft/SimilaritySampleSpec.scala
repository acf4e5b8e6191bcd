package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import llm.SimilarityQueries

/** Scale-contract spec for quantizer training: the driver-side sample
  * must be O(1) in corpus rows (VERDICT r02 #1 — the old policy
  * collected a FIXED FRACTION of the corpus, a driver OOM at scale).
  */
class SimilaritySampleSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Synthetic "embeddings" 10× larger than the cap — if sampling were
    * proportional this corpus would yield ~half of 40960 rows.
    */
  private def bigCorpus = {
    import spark.implicits._
    spark.range(0, 10L * SimilarityQueries.MaxTrainSample)
      .select(col("id").as("vec_id"),
        array((0 until 4).map(d => (col("id") % (d + 7)).cast("double")): _*).as("emb"))
  }

  test("training sample is capped, not proportional to corpus size") {
    val n = SimilarityQueries.sampleVectors(bigCorpus).length
    assert(n == SimilarityQueries.MaxTrainSample,
      s"sample on a ${10 * SimilarityQueries.MaxTrainSample}-row corpus collected $n rows")
  }

  test("training sample takes the whole corpus when it fits the cap") {
    val small = bigCorpus.filter(col("vec_id") < 100)
    assert(SimilarityQueries.sampleVectors(small).length == 100)
  }

  test("training sample is deterministic and partitioning-invariant") {
    val a = SimilarityQueries.sampleVectors(bigCorpus)
    val b = SimilarityQueries.sampleVectors(bigCorpus.repartition(13))
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "content-hash-ranked sample must not depend on physical layout")
  }

  test("sample plan is a bounded top-k (TakeOrderedAndProject), not a global sort") {
    val plan = bigCorpus
      .select(col("vec_id"), col("emb"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(SimilarityQueries.MaxTrainSample)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k plan:\n$plan")
  }
}
