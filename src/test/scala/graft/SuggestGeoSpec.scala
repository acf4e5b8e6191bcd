package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-6 search-surface additions: term/phrase
  * suggesters, the `nested`-object query, and the geo family.
  */
class SuggestGeoSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // --- suggesters -------------------------------------------------------

  test("term suggester corrects each probe to its intended vocab term") {
    val rows = run("search_suggest_term").collect()
    assert(rows.nonEmpty)
    val best = rows.filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[String]("input") -> r.getAs[String]("suggestion"))
      .toMap
    assert(best("sparc") == "spark", best)
    assert(best("jion") == "join", best)
    assert(best("windoww") == "window", best)
    assert(best("streem") == "stream", best)
    // suggest_mode=missing: never suggest the input itself / dist 0.
    assert(rows.forall(r => r.getAs[Int]("dist") >= 1))
    // prefix_length=1: every suggestion keeps the first character.
    assert(rows.forall(r =>
      r.getAs[String]("suggestion").head == r.getAs[String]("input").head))
  }

  test("term suggester ranking matches brute-force (dist, df desc, term)") {
    // Recompute candidates for one probe from the raw corpus with a
    // plain driver-side levenshtein — the spec's independent oracle.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .distinct().groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = vocab.keys.toSeq
      .filter(t => t.headOption.contains('s') && math.abs(t.length - 5) <= 2)
      .map(t => (t, lev("sparc", t), vocab(t)))
      .filter { case (_, d, _) => d >= 1 && d <= 2 }
      .sortBy { case (t, d, df) => (d, -df, t) }
      .take(3).map(_._1)
    val got = run("search_suggest_term").collect()
      .filter(_.getAs[String]("input") == "sparc")
      .sortBy(_.getAs[Int]("rnk")).map(_.getAs[String]("suggestion")).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("phrase suggester's top phrase corrects both words") {
    val rows = run("search_suggest_phrase").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("phrase") == "spark join", rows.toSeq)
    // Bounded compose: never more than 3x3 candidate phrases.
    assert(rows.length <= 5)
  }

  // --- nested-object query ---------------------------------------------

  test("nested query: per-element conjunction, not flattened AND") {
    val rows = run("search_nested_query").collect()
    assert(rows.nonEmpty)
    // The result is the flattened-match superset; the false positives
    // (some element qty>=48, some OTHER element flag='R', none both)
    // must actually occur — that asymmetry IS the nested semantics.
    val falsePos = rows.filter(!_.getAs[Boolean]("nested_match"))
    assert(falsePos.nonEmpty, "no flattened-only rows — the fixture " +
      "no longer distinguishes nested from flattened matching")
    assert(falsePos.forall(_.getAs[Long]("n_inner_hits") == 0L))
    // Re-verify one true match element-by-element from the raw table.
    rows.find(_.getAs[Boolean]("nested_match")).foreach { r =>
      val key = r.getAs[Long]("o_orderkey")
      val items = Tables(spark, sf, "lineitem")
        .filter(col("l_orderkey") === key)
        .select(col("l_quantity"), col("l_returnflag")).collect()
      val hits = items.filter(i =>
        i.getDouble(0) >= 48 && i.getString(1) == "R")
      assert(hits.length.toLong == r.getAs[Long]("n_inner_hits"))
      assert(math.abs(hits.map(_.getDouble(0)).max -
        r.getAs[Double]("best_inner_qty")) < 1e-9)
    }
  }

  // --- geo family -------------------------------------------------------

  test("geo_distance: haversine verified against driver-side recompute") {
    val rows = run("search_geo_distance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lat = r.getAs[Long]("lat_e4") / 10000.0
      val lon = r.getAs[Long]("lon_e4") / 10000.0
      val sdlat = math.sin(math.toRadians(lat - 40.0) / 2)
      val sdlon = math.sin(math.toRadians(lon + 74.0) / 2)
      val d = 12742.0 * math.asin(math.sqrt(sdlat * sdlat +
        math.cos(math.toRadians(40.0)) * math.cos(math.toRadians(lat)) *
          sdlon * sdlon))
      assert(math.abs(d - r.getAs[Double]("dist_km")) < 1e-3, r)
      assert(r.getAs[Double]("dist_km") <= 2000.0)
    }
    // Sorted nearest-first.
    val ds = rows.map(_.getAs[Double]("dist_km")).toSeq
    assert(ds == ds.sorted)
  }

  test("geo_bounding_box pushes the integer range filter into the scan") {
    val df = run("search_geo_bounding_box")
    df.collect().foreach { r =>
      val lat = r.getAs[Long]("lat_e4"); val lon = r.getAs[Long]("lon_e4")
      assert(lat >= 100000 && lat <= 600000 && lon >= -300000 && lon <= 400000)
    }
    // The coordinate derivation is a projection of c_custkey, so the
    // filter cannot reach the parquet scan as-is — but the scan must
    // still be column-pruned to the single key column it needs.
    val read = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_custkey") && !read.contains("c_acctbal"), read)
  }

  test("geohash_grid: cells bounded at 1024, counts conserve the corpus") {
    val rows = run("search_geohash_grid").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[String]("geohash").length == 2))
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    assert(rows.forall(_.getAs[String]("geohash").forall(alphabet)))
    // Descending by count, geohash tie-break.
    val cs = rows.map(_.getAs[Long]("doc_count")).toSeq
    assert(cs == cs.sorted.reverse)
  }

  test("geo_distance plans as TakeOrderedAndProject (no global sort)") {
    val p = run("search_geo_distance").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("geo_centroid equals the exact rational mean, truncated") {
    val rows = run("search_geo_centroid").collect()
    assert(rows.nonEmpty)
    val pts = Tables(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ks = pts(r.getAs[String]("c_mktsegment")).map(_._2)
      val lat = ks.map(k => k * 2654435761L % 1800001).sum / ks.length - 900000
      val lon = ks.map(k => k * 2246822519L % 3600001).sum / ks.length - 1800000
      assert(r.getAs[Long]("centroid_lat_e4") == lat, r)
      assert(r.getAs[Long]("centroid_lon_e4") == lon, r)
    }
  }

  test("geo_polygon matches a driver-side PNPOLY reference") {
    // Independent double-precision ray-cast (the classic PNPOLY loop)
    // over every customer — must agree exactly with the engine's
    // integer form, since no point sits on an edge of this polygon.
    val poly = search.GeoQueries.Polygon
    def inside(lat: Long, lon: Long): Boolean = {
      var in = false
      var i = 0
      while (i < poly.size) {
        val (yi, xi) = poly(i)
        val (yj, xj) = poly((i + 1) % poly.size)
        if ((yi > lat) != (yj > lat) &&
          lon.toDouble < xi + (xj - xi).toDouble * (lat - yi) / (yj - yi))
          in = !in
        i += 1
      }
      in
    }
    val got = run("search_geo_polygon").collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    val want = Tables(spark, sf, "customer").select(col("c_custkey"))
      .collect().map(_.getLong(0))
      .filter(k => inside(k * 2654435761L % 1800001 - 900000,
        k * 2246822519L % 3600001 - 1800000))
      .sorted.take(25).toSet
    assert(got == want, s"got=${got.toSeq.sorted} want=${want.toSeq.sorted}")
    assert(got.nonEmpty, "polygon matched nothing — widen it")
  }

  test("nested agg: n_items counts elements, reverse_nested counts parents") {
    val rows = run("search_facets_nested_agg").collect()
    assert(rows.nonEmpty)
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val of = li.filter(_._1 == flag)
      assert(r.getAs[Long]("n_items") == of.length.toLong, r)
      assert(r.getAs[Long]("n_orders") == of.map(_._2).distinct.length.toLong, r)
      // The reverse_nested count can never exceed the element count.
      assert(r.getAs[Long]("n_orders") <= r.getAs[Long]("n_items"))
    }
  }

  test("children agg: child counts/metrics per parent bucket re-verified") {
    val rows = run("search_facets_children").collect()
    assert(rows.nonEmpty)
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .map(r => (orders(r.getLong(0)), r.getLong(0), r.getDouble(1)))
    rows.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      val of = li.filter(_._1 == st)
      assert(r.getAs[Long]("n_children") == of.length.toLong, r)
      assert(r.getAs[Long]("n_parents") == of.map(_._2).distinct.length.toLong, r)
      assert(math.abs(r.getAs[Double]("sum_child_qty") - of.map(_._3).sum) < 1e-6, r)
    }
  }

  test("pointInPolyExpr parity matches PNPOLY on 2000 seeded random points") {
    // The shared-text SQL generator is the single algorithmic source
    // for BOTH engines — so its correctness is proven once, against an
    // independent driver-side reference, over far more geometry than
    // the 150 fixture points cover: 2000 seeded points spanning the
    // full coordinate domain, plus the polygon's own vertices (the
    // half-open rule's edge case).
    val rnd = new scala.util.Random(42)
    val poly = search.GeoQueries.Polygon
    val pts = Seq.fill(2000)(
      (rnd.nextLong(1800001L) - 900000L, rnd.nextLong(3600001L) - 1800000L)) ++
      poly // vertices exercise the boundary discipline
    def pnpoly(lat: Long, lon: Long): Boolean = {
      var in = false
      for (i <- poly.indices) {
        val (yi, xi) = poly(i)
        val (yj, xj) = poly((i + 1) % poly.size)
        // Exact integer form, independently re-derived: lon strictly
        // left of the edge's crossing at this latitude.
        if ((yi > lat) != (yj > lat)) {
          val lhs = (lon - xi) * (yj - yi)
          val rhs = (xj - xi) * (lat - yi)
          if (if (yj - yi > 0) lhs < rhs else lhs > rhs) in = !in
        }
      }
      in
    }
    import spark.implicits._
    val df = pts.toDF("lat_e4", "lon_e4")
      .withColumn("in_poly",
        org.apache.spark.sql.functions.expr(
          search.GeoQueries.pointInPolyExpr(poly)))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    pts.foreach { case (lat, lon) =>
      assert(got((lat, lon)) == pnpoly(lat, lon), s"($lat, $lon)")
    }
  }

  test("geohash2 bits/string round-trip against a driver-side reference") {
    val rnd = new scala.util.Random(7)
    val cells = Seq.fill(300)((rnd.nextInt(32).toLong, rnd.nextInt(32).toLong)) ++
      Seq((0L, 0L), (31L, 31L), (0L, 31L), (31L, 0L))
    def ref(latB: Long, lonB: Long): (Long, String) = {
      var gh = 0L
      for (j <- 0 until 5) {
        gh |= ((lonB >> j) & 1L) << (2 * j + 1)
        gh |= ((latB >> j) & 1L) << (2 * j)
      }
      val a = "0123456789bcdefghjkmnpqrstuvwxyz"
      (gh, s"${a((gh >> 5).toInt & 31)}${a(gh.toInt & 31)}")
    }
    import spark.implicits._
    val df = cells.toDF("lat_b", "lon_b")
      .withColumn("gh", org.apache.spark.sql.functions.expr(
        search.GeoQueries.geohash2BitsExpr("DIV")))
      .withColumn("s", org.apache.spark.sql.functions.expr(
        search.GeoQueries.geohash2StrExpr("DIV")))
    df.collect().foreach { r =>
      val (gh, str) = ref(r.getLong(0), r.getLong(1))
      assert(r.getAs[Long]("gh") == gh, r)
      assert(r.getAs[String]("s") == str, r)
    }
  }

  test("pinned query: curated ids rank first in pin order, organic tail intact") {
    val rows = run("search_pinned").collect()
    assert(rows.nonEmpty)
    val pinned = rows.takeWhile(_.getAs[Boolean]("pinned"))
    // Fixture doc_ids are dense from 0, so all three pins exist.
    assert(pinned.map(_.getAs[Long]("doc_id")).toSeq == Seq(17L, 5L, 42L), rows.toSeq)
    val organic = rows.drop(pinned.length)
    assert(organic.nonEmpty && organic.forall(!_.getAs[Boolean]("pinned")))
    val scores = organic.map(_.getAs[Int]("score")).toSeq
    assert(scores == scores.sorted.reverse) // organic order untouched
  }

  test("distance_feature: recency ppm is the exact integer hyperbola") {
    val rows = run("search_distance_feature").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("days_back")
      assert(d >= 0)
      assert(r.getAs[Long]("recency_ppm") == 30L * 1000000L / (30L + d), r)
    }
    val ppm = rows.map(_.getAs[Long]("recency_ppm")).toSeq
    assert(ppm == ppm.sorted.reverse)
  }

  test("runtime field: derived filter + histogram agree with base-field math") {
    val rows = run("search_runtime_field").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket_s")
      assert(b % 5 == 0 && b >= 10, r)
      // Bucket bounds in base-field units: n_chars DIV 15 in [b, b+5).
      assert(r.getAs[Long]("min_chars") / 15 >= b, r)
      assert(r.getAs[Long]("max_chars") / 15 < b + 5, r)
    }
  }
}
