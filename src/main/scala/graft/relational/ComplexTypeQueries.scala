package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Complex-type surface: map columns, struct construction + JSON
  * round-trips, schema-evolution union, and generator expressions —
  * the remaining type-system breadth of a complete engine. All per-row
  * (no shuffle beyond the presentation sort), all DuckDB-oracle'd.
  */
object ComplexTypeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Map columns: build per-row maps, access/keys/size.
    "rel_map_funcs" -> ((s, dir) => {
      val m = map(
        lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          element_at(m, "status").as("status_val"),
          element_at(m, "prio").as("prio_val"),
          size(m).as("n_entries"),
          // Serialized (array_join) so the oracle harness can sort/hash;
          // map_keys itself still runs.
          array_join(map_keys(m), ",").as("keys"))
        .orderBy(col("o_orderkey"))
    }),

    // Struct build -> to_json -> from_json round trip + field access.
    "rel_struct_json" -> ((s, dir) => {
      val st = struct(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
      val parsed = from_json(to_json(st),
        StructType(Seq(StructField("k", LongType), StructField("st", StringType))))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          to_json(st).as("as_json"),
          parsed.getField("k").as("k_back"),
          parsed.getField("st").as("st_back"))
        .orderBy(col("o_orderkey"))
    }),

    // VARIANT (Spark 4's semi-structured type; the parquet variant
    // shredding story at warehouse scale): parse the JSON props
    // column ONCE into the binary variant encoding, then typed
    // variant_get extraction — vs re-parsing the string per accessor
    // (get_json_object). Missing paths extract as NULL, exercised by
    // $.missing. At 100 TB variant columns shred into parquet
    // subcolumns at write, making the typed extraction a plain
    // columnar read — the plan already carries the
    // PushedVariantExtractions slot.
    "rel_variant_json" -> ((s, dir) => {
      val v = parse_json(col("props"))
      Tables(s, dir, "events")
        .select(col("event_type"),
          variant_get(v, "$.k", "long").as("k"),
          variant_get(v, "$.missing", "long").as("missing"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(col("missing")).as("n_missing_present"))
        .orderBy(col("event_type"))
    }),

    // Schema-evolution union: two projections with different column
    // sets, unioned by NAME with nulls for the missing side — the
    // operation every long-lived 100 TB table needs when schemas
    // drift across partitions/epochs.
    "rel_union_by_name" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
      v1.unionByName(v2.withColumn("o_orderstatus", lit(null).cast(StringType))
          .drop("o_totalprice"),
          allowMissingColumns = true)
        .unionByName(v2, allowMissingColumns = true)
        .filter(col("o_orderkey") <= 100)
        .orderBy(col("o_orderkey"), col("o_orderstatus").asc_nulls_first,
          col("o_totalprice").asc_nulls_first)
    }),

    // Generator: per-order month sequence (order month .. +2 months),
    // exploded — sequence generation + lateral-view shape.
    "rel_generate_series" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") <= 50)
        .select(col("o_orderkey"), col("o_orderdate"),
          explode(sequence(lit(0), lit(2))).as("month_offset"))
        .withColumn("month_start",
          add_months(date_trunc("month", col("o_orderdate")), col("month_offset").cast(IntegerType)))
        .select(col("o_orderkey"), col("month_offset"), col("month_start"))
        .orderBy(col("o_orderkey"), col("month_offset"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "rel_variant_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'k' AS BIGINT)) AS max_k,
        |  count(CAST(props->>'missing' AS BIGINT)) AS n_missing_present
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rel_map_funcs" ->
      """SELECT o_orderkey,
        |  m['status'][1] AS status_val,
        |  m['prio'][1] AS prio_val,
        |  CAST(cardinality(m) AS INT) AS n_entries,
        |  array_to_string(map_keys(m), ',') AS keys
        |FROM (SELECT o_orderkey,
        |        MAP {'status': o_orderstatus, 'prio': o_orderpriority} AS m
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "rel_struct_json" ->
      """SELECT o_orderkey,
        |  to_json(struct_pack(k := o_orderkey, st := o_orderstatus)) AS as_json,
        |  o_orderkey AS k_back,
        |  o_orderstatus AS st_back
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "rel_union_by_name" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS VARCHAR), o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |WHERE o_orderkey <= 100
        |ORDER BY o_orderkey, o_orderstatus ASC NULLS FIRST,
        |         o_totalprice ASC NULLS FIRST""".stripMargin,
    "rel_generate_series" ->
      """SELECT o_orderkey, CAST(g.month_offset AS INT) AS month_offset,
        |  date_trunc('month', o_orderdate) + to_months(CAST(g.month_offset AS INT)) AS month_start
        |FROM orders
        |CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS month_offset) g
        |WHERE o_orderkey <= 50
        |ORDER BY o_orderkey, month_offset""".stripMargin
  )
}
