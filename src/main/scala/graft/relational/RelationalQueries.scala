package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational surface the reference delegates to Elasticsearch / MySQL
  * (SURVEY.md §2.2–§2.3), owned natively.
  *
  * Determinism rules for the DuckDB hash-compare: every float aggregate
  * goes through exact DECIMAL accumulation (addition order then cannot
  * change the result) and is emitted as DOUBLE; every query ends in an
  * explicit ORDER BY with a full tie-break.
  *
  * Scale notes (100 TB discipline): fact-fact joins are equi-joins on the
  * shuffle key Catalyst picks (sort-merge w/ AQE skew splitting); dimension
  * joins are explicitly `broadcast(...)` so no shuffle of the fact side;
  * aggregations are partial+final (map-side combine) by construction of
  * groupBy+agg. Nothing collects to the driver.
  */
object RelationalQueries {

  /** Exact decimal arithmetic for money columns. The fixture money values
    * carry exactly 2 decimals, so the input cast double→DECIMAL(12,2) is
    * lossless; all subsequent multiplies/sums are exact decimal ops (no
    * engine-dependent float rounding anywhere), and only the final result
    * is emitted as DOUBLE. This is what makes the DuckDB hash-compare
    * byte-stable: double→decimal conversion of *products* differs between
    * engines at high scale, decimal-in/decimal-through never does.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(12, 2))
  private def dsum(e: Column): Column = sum(e).cast(DoubleType)

  private val revenue: Column = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan + filter + hash aggregate (partial+final).
    "rel_q1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(dec2(col("l_quantity"))).as("sum_qty"),
          dsum(dec2(col("l_extendedprice"))).as("sum_base_price"),
          dsum(revenue).as("sum_disc_price"),
          dsum(revenue * (one + dec2(col("l_tax")))).as("sum_charge"),
          (sum(dec2(col("l_quantity"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Filter + projection — predicate and column pruning must reach the
    // parquet scan (verified in PlanSpec: PushedFilters non-empty).
    "rel_filter_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01").cast(TimestampType) &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate"))
    }),

    // Broadcast hash join: fact × small dim — dim ships to every executor,
    // fact side never shuffles.
    "rel_join_broadcast_dim" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(revenue).as("revenue"))
        .orderBy(col("p_brand"))
    }),

    // 5-way star join: lineitem⋈orders (shuffle, both big at scale) then
    // broadcast dims customer-side chain; revenue per region.
    "rel_join_star_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // Left outer join with null-side aggregation: every customer with
    // their order count — customers without orders surface with 0.
    "rel_join_left_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(dec2(col("o_totalprice")), lit(0).cast(DecimalType(12, 2))))
            .as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Full outer join: union of key spaces with nulls where one side
    // is absent — here high-value orders vs recent orders.
    "rel_join_full_outer" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("big_key"), col("o_totalprice"))
      val recent = o.filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType))
        .select(col("o_orderkey").as("recent_key"), col("o_orderdate"))
      big.join(recent, col("big_key") === col("recent_key"), "full_outer")
        .select(
          coalesce(col("big_key"), col("recent_key")).as("o_orderkey"),
          col("big_key").isNotNull.as("is_big"),
          col("recent_key").isNotNull.as("is_recent"))
        .orderBy(col("o_orderkey"))
    }),

    // RANGE window frame: for each order, total spent across ALL of
    // the same customer's orders within +-30 days of it (value-based
    // frame, not row-count-based).
    "rel_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400, 30L * 86400)
      Tables(s, dir, "orders")
        .withColumn("nearby_spend",
          sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("nearby_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Distribution window functions: percent_rank / cume_dist —
    // rank-derived rational arithmetic, deterministic across engines.
    "rel_window_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // Left-semi join (EXISTS): orders that have at least one high-quantity
    // line. Semi joins ship only the key column of the probe side.
    "rel_join_semi" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val big = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_orderkey"))
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Left-anti join (NOT EXISTS): customers with no orders.
    "rel_join_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Window: top-3 orders per customer by totalprice (row_number) —
    // single shuffle on o_custkey, in-partition sort.
    "rel_window_topn_per_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rank_in_cust", row_number().over(w))
        .filter(col("rank_in_cust") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank_in_cust"))
        .orderBy(col("o_custkey"), col("rank_in_cust"), col("o_orderkey"))
    }),

    // Window: running sum per supplier over ship time — DECIMAL running
    // frame so the prefix sums are order-exact; full tie-break in ORDER BY.
    "rel_window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "lineitem")
        .withColumn("running_qty",
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
    }),

    // Global top-k: TakeOrderedAndProject — no full sort, each partition
    // keeps k rows, driver merges k×partitions (verified in PlanSpec).
    "rel_sort_limit_topk" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)
    }),

    // Set ops over compatible projections.
    "rel_set_ops" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val both = building.intersect(rich).withColumn("tag", lit("both"))
      val onlyB = building.except(rich).withColumn("tag", lit("building_only"))
      both.unionAll(onlyB).orderBy(col("tag"), col("c_custkey"))
    }),

    // Multi-dimensional aggregate: ROLLUP (grouping sets) with exact sums.
    "rel_rollup" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(dec2(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Distinct aggregates: exact distinct counts (two-phase shuffle).
    "rel_distinct_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Scalar function library over orders: string/date/math built-ins —
    // all codegen'd, no UDFs.
    "rel_scalar_funcs" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          length(col("o_orderstatus")).as("status_len"),
          concat_ws("_", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          (col("o_orderkey") % 7).as("key_mod7"),
          round(col("o_totalprice")).as("price_round"),
          abs(col("o_totalprice") - 250000.0).as("price_dist"))
        .orderBy(col("o_orderkey"))
    }),

    // Entity-resolution (dirty) join — the record-linkage primitive
    // relational engines lack and warehouses bolt on: which catalog
    // names are the SAME entity misspelled ("cold plate" vs "old
    // plate")? Canonical ER shape: resolve on the distinct-NAME table
    // first (bounded vocabulary, never row×row), block candidates by
    // shared character bigram (any edit-distance-≤2 pair of length ≥6
    // shares one: d edits destroy ≤ 2d of the n−1 bigrams), then
    // verify the survivors with exact levenshtein ≤ 2. At 100 TB the
    // blocking join is the only wide op and it is linear in the
    // bigram-postings size (the same df-shaped join as the shingle
    // dedup family), with the O(n²) verify confined to same-block
    // candidates; the oracle mirrors block + verify exactly, so the
    // operator is hash-checked end to end.
    "rel_join_fuzzy_names" -> ((s, dir) => {
      val names = Tables(s, dir, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_parts"))
      val grams = names.select(col("name"),
        explode(expr(
          "array_distinct(transform(sequence(1, length(name) - 1), " +
            "i -> substring(name, i, 2)))")).as("bg"))
      val cand = grams.as("ga")
        .join(grams.as("gb"),
          col("ga.bg") === col("gb.bg") && col("ga.name") < col("gb.name"))
        .select(col("ga.name").as("name_a"), col("gb.name").as("name_b"))
        .distinct()
      cand
        .filter(levenshtein(col("name_a"), col("name_b")) <= 2)
        .join(names.select(col("name").as("name_a"), col("n_parts").as("n_parts_a")), "name_a")
        .join(names.select(col("name").as("name_b"), col("n_parts").as("n_parts_b")), "name_b")
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"),
          col("n_parts_a"), col("n_parts_b"))
        .orderBy(col("name_a"), col("name_b"))
    }),

    // The same ER shape scored by Jaro-Winkler ≥ 0.9 — the similarity
    // record linkage actually standardized on (edit distance punishes
    // long names; JW's prefix boost matches how humans misspell).
    // Scored by the engine's native codegen'd kernel
    // ([[graft.functions.JaroWinklerExpr]], standard parameters), which
    // DuckDB's jaro_winkler_similarity mirrors — so unlike most custom
    // kernels this one is oracle-checked through a query, not only
    // spec-pinned. Same bounded bigram-blocked candidate set as
    // rel_join_fuzzy_names; verify is one fused kernel call per
    // candidate.
    "rel_join_fuzzy_jw" -> ((s, dir) => {
      val names = Tables(s, dir, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_parts"))
      val grams = names.select(col("name"),
        explode(expr(
          "array_distinct(transform(sequence(1, length(name) - 1), " +
            "i -> substring(name, i, 2)))")).as("bg"))
      val jw = call_function("jaro_winkler", col("name_a"), col("name_b"))
      grams.as("ga")
        .join(grams.as("gb"),
          col("ga.bg") === col("gb.bg") && col("ga.name") < col("gb.name"))
        .select(col("ga.name").as("name_a"), col("gb.name").as("name_b"))
        .distinct()
        .filter(jw >= 0.9)
        .select(col("name_a"), col("name_b"), round(jw, 6).as("jw"))
        .orderBy(col("name_a"), col("name_b"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "rel_q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' AND l_discount > 0.05
        |ORDER BY 1,2,3,4""".stripMargin,
    "rel_join_broadcast_dim" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "rel_join_star_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "rel_join_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  CAST(SUM(coalesce(CAST(o_totalprice AS DECIMAL(12,2)),
        |                    CAST(0 AS DECIMAL(12,2)))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "rel_join_full_outer" ->
      """SELECT coalesce(big_key, recent_key) AS o_orderkey,
        |  big_key IS NOT NULL AS is_big,
        |  recent_key IS NOT NULL AS is_recent
        |FROM (SELECT o_orderkey AS big_key, o_totalprice FROM orders
        |      WHERE o_totalprice > 400000) b
        |FULL OUTER JOIN
        |     (SELECT o_orderkey AS recent_key, o_orderdate FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') r
        |ON big_key = recent_key
        |ORDER BY o_orderkey""".stripMargin,
    "rel_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 2592000 PRECEDING AND 2592000 FOLLOWING) AS DOUBLE)
        |    AS nearby_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "rel_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "rel_join_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "rel_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rel_window_topn_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
        |  FROM orders)
        |WHERE rank_in_cust <= 3
        |ORDER BY o_custkey, rank_in_cust, o_orderkey""".stripMargin,
    "rel_window_running_sum" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "rel_sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "rel_set_ops" ->
      """SELECT c_custkey, 'both' AS tag FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |UNION ALL
        |SELECT c_custkey, 'building_only' AS tag FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY tag, c_custkey""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "rel_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(length(o_orderstatus) AS INT) AS status_len,
        |  concat_ws('_', o_orderstatus, o_orderpriority) AS status_prio,
        |  CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  CAST(day(o_orderdate) AS INT) AS o_day,
        |  o_orderkey % 7 AS key_mod7,
        |  round(o_totalprice) AS price_round,
        |  abs(o_totalprice - 250000.0) AS price_dist
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "rel_join_fuzzy_names" ->
      """WITH names AS (
        |  SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1),
        |g AS (
        |  SELECT name, unnest(list_distinct(
        |    list_transform(generate_series(1, len(name) - 1),
        |                   i -> substr(name, i, 2)))) AS bg
        |  FROM names),
        |cand AS (
        |  SELECT DISTINCT ga.name AS name_a, gb.name AS name_b
        |  FROM g ga JOIN g gb ON ga.bg = gb.bg AND ga.name < gb.name)
        |SELECT c.name_a, c.name_b,
        |  CAST(levenshtein(c.name_a, c.name_b) AS INT) AS dist,
        |  na.n_parts AS n_parts_a, nb.n_parts AS n_parts_b
        |FROM cand c
        |JOIN names na ON c.name_a = na.name
        |JOIN names nb ON c.name_b = nb.name
        |WHERE levenshtein(c.name_a, c.name_b) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "rel_join_fuzzy_jw" ->
      """WITH names AS (
        |  SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1),
        |g AS (
        |  SELECT name, unnest(list_distinct(
        |    list_transform(generate_series(1, len(name) - 1),
        |                   i -> substr(name, i, 2)))) AS bg
        |  FROM names),
        |cand AS (
        |  SELECT DISTINCT ga.name AS name_a, gb.name AS name_b
        |  FROM g ga JOIN g gb ON ga.bg = gb.bg AND ga.name < gb.name)
        |SELECT name_a, name_b,
        |  round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
        |FROM cand
        |WHERE jaro_winkler_similarity(name_a, name_b) >= 0.9
        |ORDER BY name_a, name_b""".stripMargin
  )
}
