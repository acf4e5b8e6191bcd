package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 search-surface additions: the `regexp` term
  * query, the `span_containing` / `span_within` combinators, and the
  * `geo_shape` relation query. The driver's DuckDB gate hash-checks
  * values; these pin the SEMANTIC invariants and the plan shapes the
  * operators claim.
  */
class SpanRegexGeoShapeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // --- regexp -----------------------------------------------------------

  test("regexp matches exactly the alternation's four dictionary terms") {
    val rows = run("search_regexp").collect()
    assert(rows.nonEmpty)
    // Independent recompute from the raw corpus: per-doc occurrence
    // count of tokens the pattern accepts.
    val want = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").isin("scan", "sort", "slow", "stream"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(want(r.getAs[Long]("doc_id")) == r.getAs[Long]("n_matches"), r)
    }
    // Ranking: n_matches desc, doc_id asc.
    val pairs = rows.map(r => (r.getAs[Long]("n_matches"), r.getAs[Long]("doc_id")))
    assert(pairs.sameElements(pairs.sortBy { case (n, id) => (-n, id) }))
  }

  test("regexp probe pushes the literal prefix into the postings scan") {
    val p = run("search_regexp").queryExecution.executedPlan.toString
    assert(p.contains("StringStartsWith(term,s)") ||
      p.contains("StringStartsWith(term, s)"), p)
  }

  // --- span combinators -------------------------------------------------

  test("span_containing and span_within agree doc-for-doc with a scan recompute") {
    // Brute-force recompute: big spans = 'group'..'order' gap <= 5 in
    // order; little = 'join' positions.
    val toks = Tables(spark, sf, "documents").collect().map { r =>
      r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").toSeq
    }
    val want = toks.flatMap { case (id, ts) =>
      val pos = ts.zipWithIndex
      val ga = pos.filter(_._1 == "group").map(_._2)
      val ob = pos.filter(_._1 == "order").map(_._2)
      val jn = pos.filter(_._1 == "join").map(_._2)
      val big = for (a <- ga; b <- ob if b > a && b - a <= 5) yield (a, b)
      val cont = big.filter { case (a, b) => jn.exists(q => q >= a && q <= b) }
      val within = jn.filter(q => big.exists { case (a, b) => q >= a && q <= b })
      if (cont.isEmpty) None else Some(id -> (cont.length, within.length))
    }.toMap
    val gotC = run("search_span_containing").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_spans")).toMap
    val gotW = run("search_span_within").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_within")).toMap
    assert(gotC.keySet == want.keySet, s"containing docs: $gotC vs $want")
    assert(gotW.keySet == want.keySet, s"within docs: $gotW vs $want")
    want.foreach { case (id, (nc, nw)) =>
      assert(gotC(id) == nc.toLong, s"doc $id containing")
      assert(gotW(id) == nw.toLong, s"doc $id within")
    }
  }

  // --- geo_shape --------------------------------------------------------

  test("geo_shape relations partition the corpus per shape") {
    val rows = run("search_geo_shape").collect()
    assert(rows.length == 6) // 3 shapes x {intersects, disjoint}
    val total = Tables(spark, sf, "customer").count()
    rows.groupBy(_.getAs[String]("shape")).foreach { case (shape, rs) =>
      // intersects + disjoint = everything, per shape.
      assert(rs.map(_.getAs[Long]("doc_count")).sum == total, shape)
    }
    // The chevron shape row agrees with the standalone geo_polygon
    // query's predicate (same ray-cast kernel, same polygon).
    val chevron = rows.find(r => r.getAs[String]("shape") == "chevron" &&
      r.getAs[String]("relation") == "intersects").get
    val polyCount = Tables(spark, sf, "customer")
      .select(col("c_custkey"),
        (col("c_custkey") * 2654435761L % 1800001 - 900000).as("lat_e4"),
        (col("c_custkey") * 2246822519L % 3600001 - 1800000).as("lon_e4"))
      .filter(expr(graft.search.GeoQueries.pointInPolyExpr(
        graft.search.GeoQueries.Polygon)))
      .count()
    assert(chevron.getAs[Long]("doc_count") == polyCount)
  }

  /** Independent Scala reference for the shape-vs-shape kernel —
    * written from PNPOLY + separating-axis first principles, no shared
    * code with [[graft.search.GeoQueries.boxPolyRelationExpr]].
    * poly is (lat, lon) vertices, boxes are lon=x / lat=y.
    */
  private object ShapeRef {
    def inPoly(poly: Seq[(Long, Long)], y: Long, x: Long): Boolean = {
      var c = 0
      for (i <- poly.indices) {
        val (yi, xi) = poly(i)
        val (yj, xj) = poly((i + 1) % poly.size)
        val d = yj - yi
        if (d != 0 && ((yi > y) != (yj > y))) {
          val lhs = (x - xi) * d
          val rhs = (xj - xi) * (y - yi)
          if (if (d > 0) lhs < rhs else lhs > rhs) c += 1
        }
      }
      c % 2 == 1
    }
    def segMeetsBox(ax: Long, ay: Long, bx: Long, by: Long,
                    x1: Long, x2: Long, y1: Long, y2: Long): Boolean = {
      if (math.max(ax, bx) < x1 || math.min(ax, bx) > x2 ||
        math.max(ay, by) < y1 || math.min(ay, by) > y2) return false
      val (dx, dy) = (bx - ax, by - ay)
      val sides = Seq((x1, y1), (x1, y2), (x2, y1), (x2, y2))
        .map { case (cx, cy) => dx * (cy - ay) - dy * (cx - ax) }
      if (sides.forall(_ > 0) || sides.forall(_ < 0)) return false
      val (ta, tb) = (dx * ax + dy * ay, dx * bx + dy * by)
      val ts = Seq((x1, y1), (x1, y2), (x2, y1), (x2, y2))
        .map { case (cx, cy) => dx * cx + dy * cy }
      ts.max >= math.min(ta, tb) && ts.min <= math.max(ta, tb)
    }
    def relation(poly: Seq[(Long, Long)],
                 x1: Long, x2: Long, y1: Long, y2: Long): String = {
      val corners = Seq((x1, y1), (x1, y2), (x2, y1), (x2, y2))
      val edgeX = poly.indices.exists { i =>
        val (ay, ax) = poly(i)
        val (by, bx) = poly((i + 1) % poly.size)
        segMeetsBox(ax, ay, bx, by, x1, x2, y1, y2)
      }
      val cornersIn = corners.map { case (cx, cy) => inPoly(poly, cy, cx) }
      val vertexIn = poly.exists { case (vy, vx) =>
        vx >= x1 && vx <= x2 && vy >= y1 && vy <= y2 }
      if (cornersIn.forall(identity) && !edgeX) "within"
      else if (cornersIn.exists(identity) || vertexIn || edgeX) "intersects"
      else "disjoint"
    }
  }

  test("geo_shape_relation matches an independent Scala SAT + PNPOLY reference") {
    val poly = graft.search.GeoQueries.Polygon // (lat, lon) vertices
    val want = Tables(spark, sf, "customer").select(col("c_custkey")).collect()
      .map(_.getLong(0)).map { k =>
        val lat = k * 2654435761L % 1800001 - 900000
        val lon = k * 2246822519L % 3600001 - 1800000
        val r = (k % 7) * 10000 + 5000
        ShapeRef.relation(poly, lon - r, lon + r, lat - r, lat + r)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = run("search_geo_shape_relation").collect()
      .map(r => r.getAs[String]("relation") -> r.getAs[Long]("doc_count")).toMap
    assert(got == want, s"got=$got want=$want")
    // All three relations are genuinely populated at this SF (the
    // whole point of the shape-backed variant vs the point-backed one).
    assert(want.keySet == Set("within", "intersects", "disjoint"), want)
  }

  test("boxPolyRelationExpr matches the reference on 2000 seeded random boxes x 2 polygons") {
    // Generated-SQL-vs-reference property sweep (the pointInPolyExpr
    // random-points pattern): boxes of wildly varying size and aspect
    // all over the world, evaluated through the engine's generated
    // CASE text by Spark itself, against ShapeRef.
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val boxes = Seq.fill(2000) {
      val cx = rnd.nextLong(3400001) - 1700000
      val cy = rnd.nextLong(1700001) - 850000
      val (rx, ry) = (rnd.nextLong(400000) + 1, rnd.nextLong(400000) + 1)
      (cx - rx, cx + rx, cy - ry, cy + ry)
    }
    val df = boxes.toDF("x1", "x2", "y1", "y2")
    for (poly <- Seq(graft.search.GeoQueries.Polygon,
      graft.search.GeoQueries.Triangle)) {
      val got = df.withColumn("relation",
          expr(graft.search.GeoQueries.boxPolyRelationExpr(poly)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)) -> r.getString(4)).toMap
      boxes.foreach { case b @ (x1, x2, y1, y2) =>
        val want = ShapeRef.relation(poly, x1, x2, y1, y2)
        assert(got(b) == want, s"box $b poly $poly: got ${got(b)} want $want")
      }
    }
  }
}
