package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness of the engine-owned sketches against SEQUENTIAL
  * reference implementations (the LlmSpec discipline: the distributed
  * partial+final agg must produce the same registers/estimates as a
  * single-threaded fold over the same data), plus the scaling-law
  * queries' conservation invariants.
  */
class CorpusStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def fixtureTokens(): Seq[(String, String)] =
    Tables(spark, sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("HLL registers and estimate equal a sequential reference fold") {
    // Sequential HLL with the query's exact hash/register/estimate
    // arithmetic: bucket = first-8-hex % 64, rho from next-8-hex
    // leading zeros, est = 709·4096·2^33 DIV (1000·Σ2^(33-M)).
    val regs = scala.collection.mutable.Map.empty[(String, Long), Int]
    fixtureTokens().foreach { case (src, tok) =>
      val h = md5hex(tok)
      val v = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val w = java.lang.Long.parseLong(h.substring(8, 16), 16)
      val rho =
        if (w == 0) 33 else java.lang.Long.numberOfLeadingZeros(w) - 31
      val key = (src, v % 64)
      regs(key) = math.max(regs.getOrElse(key, 0), rho)
    }
    val expected = regs.keys.map(_._1).toSeq.distinct.sorted.map { src =>
      val s = (0L until 64L).map(b => 1L << (33 - regs.getOrElse((src, b), 0))).sum
      val v = (0L until 64L).count(b => regs.getOrElse((src, b), 0) > 0)
      val raw = (709L * 4096L * 8589934592L) / (s * 1000L)
      val est = if (raw <= 160 && v < 64)
        math.round(64.0 * math.log(64.0 / (64 - v))) else raw
      src -> est
    }.toMap
    val got = SparkEntry.queries("llm_hll_distinct")(spark, sf)
      .select(col("source"), col("est_distinct"), col("exact_distinct"), col("err_pm"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, (est, exact, errPm)) =>
      assert(est == expected(src), s"$src: distributed est $est != sequential ${expected(src)}")
      // m=64 standard error is 1.04/√64 ≈ 13%; 3σ ≈ 390‰ is the
      // fail-loud bound for a broken register path.
      assert(errPm <= 400, s"$src: err ${errPm}‰ vs exact $exact — registers broken?")
    }
  }

  test("native hll_est aggregate == compositional HLL, partitioning-invariant") {
    val compositional = SparkEntry.queries("llm_hll_distinct")(spark, sf)
      .select(col("source"), col("est_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val native = SparkEntry.queries("llm_hll_native")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == compositional,
      s"native $native != compositional $compositional")
    // merge() must be order/partitioning-independent: the same data
    // through a different partition layout yields identical registers.
    import spark.implicits._
    val skewed = Tables(spark, sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .repartition(13)
      .groupBy($"source")
      .agg(call_function("hll_est", $"token").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skewed == native, "estimate changed under repartitioning")
  }

  test("hll_est rejects a foldable NULL register count as a type error, not an NPE") {
    // hll_est(x, CAST(NULL AS INT)) is foldable and typed INT — it used
    // to pass both checks and NPE inside the `m` dereference during
    // analysis (round-8 advice). It must surface as an AnalysisException
    // (TypeCheckFailure), never a NullPointerException.
    val e = intercept[Exception] {
      Tables(spark, sf, "documents")
        .selectExpr("hll_est(source, CAST(NULL AS INT)) AS est")
        .collect()
    }
    assert(!e.isInstanceOf[NullPointerException],
      s"NULL register count NPE'd instead of failing the type check: $e")
    assert(e.getMessage.contains("non-NULL"),
      s"expected the non-NULL type-check message, got: ${e.getMessage}")
  }

  test("KMV estimates equal a sequential k-min fold; small-set rule exact") {
    val k = 32
    val H = 72057594037927936L // 2^56
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val bySrc = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.map(r => java.lang.Long.parseLong(md5hex(r._2).substring(0, 14), 16))
        .distinct.sorted
    }
    def est(hs: Seq[Long]): Long =
      if (hs.length < k) hs.length.toLong
      else (k - 1).toLong * H / hs(k - 1)
    val got = SparkEntry.queries("llm_kmv_overlap")(spark, sf).collect()
    assert(got.nonEmpty, "at least one source pair expected")
    got.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (h1, h2) = (bySrc(s1), bySrc(s2))
      assert(r.getLong(2) == est(h1), s"est_1 for $s1")
      assert(r.getLong(3) == est(h2), s"est_2 for $s2")
      val union = (h1.take(k) ++ h2.take(k)).distinct.sorted
      assert(r.getLong(4) == est(union), s"est_union for ($s1,$s2)")
      val exactInter = h1.toSet.intersect(h2.toSet).size.toLong
      assert(r.getLong(6) == exactInter, s"exact_intersection for ($s1,$s2)")
      assert(r.getLong(5) == math.max(0L, est(h1) + est(h2) - est(union)))
    }
  }

  test("vocab growth: monotone, and decile 10 conserves corpus totals") {
    val rows = SparkEntry.queries("llm_vocab_growth")(spark, sf)
      .orderBy(col("decile")).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    Seq(2, 3, 4).foreach { i => // n_docs_cum, n_tokens_cum, n_types_cum
      val vals = rows.map(_.getLong(i))
      assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
        s"column $i not monotone: ${vals.mkString(",")}")
    }
    val toks = fixtureTokens()
    val last = rows.last
    assert(last.getLong(2) == Tables(spark, sf, "documents").count())
    assert(last.getLong(3) == toks.size.toLong, "decile 10 must count every token")
    assert(last.getLong(4) == toks.map(_._2).distinct.size.toLong,
      "decile 10 must count every distinct type")
  }

  test("HDR quantile sketch: bucket brackets the exact percentile, err <= 1/8") {
    val r = SparkEntry.queries("rel_hdr_quantiles")(spark, sf).collect().head
    Seq(("p50", 1, 2, 7), ("p90", 3, 4, 8), ("p99", 5, 6, 9)).foreach {
      case (q, lbI, ubI, exI) =>
        val (lb, ub, exact) = (r.getLong(lbI), r.getLong(ubI), r.getLong(exI))
        assert(lb <= exact && exact <= ub,
          s"$q: exact $exact outside sketch bucket [$lb, $ub]")
        // 3 significand bits ⇒ bucket width ≤ lb/8: the construction
        // bound the sketch is sold on.
        assert(ub - lb <= lb / 8 + 1, s"$q: bucket [$lb,$ub] wider than lb/8")
    }
    Seq(10, 11, 12).foreach { i =>
      assert(r.getLong(i) <= 125, s"err_pm col $i exceeds the 12.5% bound")
    }
  }

  test("holt forecast equals a sequential fold of the fixed-point recurrence") {
    val rows = SparkEntry.queries("search_holt_forecast")(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.length >= 3, "expected a multi-day bucket series")
    var s = 0L
    var b = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = r.getLong(1)
      if (i == 0) { s = x * 100; b = 0L }
      else {
        val ns = (3 * x * 100 + 7 * (s + b)) / 10
        b = (ns - s + 9 * b) / 10
        s = ns
      }
      assert(r.getLong(2) == s && r.getLong(3) == b,
        s"day $i: query (${r.getLong(2)},${r.getLong(3)}) != sequential ($s,$b)")
      assert(r.getLong(4) == s + b, "forecast must be level+trend")
    }
  }

  test("rank_eval metrics are well-formed: ppm bounds, dcg <= idcg") {
    val rows = SparkEntry.queries("search_rank_eval")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (p, mrr, dcg, idcg, ndcg) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(p >= 0 && p <= 1000000, s"precision $p out of ppm range")
      assert(mrr >= 0 && mrr <= 1000000, s"mrr $mrr out of range")
      assert(dcg > 0 && dcg <= idcg, s"dcg $dcg must be in (0, idcg=$idcg]")
      assert(ndcg > 0 && ndcg <= 1000000, s"ndcg $ndcg out of ppm range")
    }
  }

  test("zipf profile: dense ranks, non-increasing freqs, rank-1 ratio = 1e6") {
    val rows = SparkEntry.queries("llm_zipf_profile")(spark, sf)
      .orderBy(col("rank")).collect()
    // sf0.001's template vocabulary can be smaller than the top-50
    // cutoff; ranks must still be dense from 1.
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val freqs = rows.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getLong(4) == 1000000L)
    rows.foreach(r => assert(r.getLong(3) == r.getInt(0).toLong * r.getLong(2)))
  }
}
