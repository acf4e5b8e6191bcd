package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Reference ETL surface, Spark-first (SURVEY.md §2.1 #1–#12).
  *
  * The reference streams `SELECT *` rows, stringifies every value via
  * `rs.getString` into a `HashMap<String,String>`
  * (`BulkProcessImpl.java:104-118`), keys documents on `S_GUID` so
  * re-imports are last-write-wins upserts (`BulkProcessImpl.java:124`),
  * and bulk-indexes in batches (`:120-141`). Here each of those stages is
  * a declarative DataFrame transform — Catalyst fuses
  * scan→cast→dedup→sink into whole-stage-codegen'd tasks, and the 200k-row
  * micro-batching / 10-way async bulk concurrency (`:186-190`) becomes
  * plain task parallelism over input partitions.
  */
object Stringify {
  /** Typed column → reference-style string value.
    *
    * Formats are pinned (not engine-default `CAST`) so the DuckDB oracle
    * matches byte-for-byte: timestamps as `yyyy-MM-dd HH:mm:ss`, doubles
    * through `DECIMAL(18,2)` (the fixtures carry 2-decimal money values),
    * everything else via plain cast. Nulls stay null, matching the
    * reference (`BulkProcessImpl.java:115-116`).
    */
  def column(c: Column, dt: DataType): Column = dt match {
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DoubleType    => c.cast(DecimalType(18, 2)).cast(StringType)
    case _             => c.cast(StringType)
  }

  /** Project-all + stringify — one codegen'd `Cast`/`DateFormat` per
    * column, no row-object materialization (vs. the reference's one
    * HashMap per row).
    */
  def all(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(f => column(col(f.name), f.dataType).as(f.name)): _*)
}

object EtlQueries {

  /** Deterministic last-write-wins dedup keyed on id columns — the Spark
    * form of ES `_id`-overwrite semantics (`BulkProcessImpl.java:124`).
    * `orderCols` defines "last"; ties are impossible when the caller
    * passes enough columns. Shuffles once on the key (hash partition),
    * window runs in-partition; at 100 TB this is a single exchange, same
    * cost class as dropDuplicates but with a deterministic survivor.
    */
  def lastWriteWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #1+#3: full scan + project-all-stringify of the fact table — the
    // reference's entire import pipeline body (BulkProcessImpl.java:96-118).
    "etl_bulk_import_stringify" -> ((s, dir) => {
      val li = Stringify.all(Tables(s, dir, "lineitem"))
      li.orderBy(li.columns.map(col): _*)
    }),

    // #4: keyed last-write-wins upsert on the composite lineitem id
    // (l_orderkey, l_linenumber) — fixtures carry real duplicate keys.
    // "Last" = max shipdate, deterministic tie-break on remaining cols.
    "etl_upsert_last_write_wins" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      lastWriteWins(
        li,
        Seq("l_orderkey", "l_linenumber"),
        Seq(col("l_shipdate").desc, col("l_extendedprice").desc, col("l_partkey").desc,
          col("l_suppkey").desc, col("l_quantity").desc, col("l_discount").desc,
          col("l_tax").desc, col("l_returnflag").desc, col("l_linestatus").desc)
      ).orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // PARTITION-GRANULAR keyed upsert end-to-end under the driver gate:
    // bulk-import documents hive-partitioned on `source`, then apply a
    // deterministic derived batch (FIXTURES.md pattern) exercising all
    // three upsert behaviors at once — payload updates (content-hash
    // ~1/4 of docs: lang→'xx', n_chars+1000), partition MOVES (hash
    // ~1/8: source→'srcmoved', so the old partition must shed the
    // row), and new-key inserts (hash ~1/8 re-keyed +1e6 into
    // 'srcnew') — and read the index back. The oracle recomputes the
    // expected post-merge state from `documents` directly, so the
    // whole write path (stringify, locality layout, touched-partition
    // rewrite, move cleanup) hash-checks; the PHYSICAL
    // only-touched-partitions property is asserted by file mtimes in
    // IndexStoreSpec, and flatness at 10–100× corpora in
    // SCALE_UPSERT_*x_probe.json.
    "etl_upsert_partitioned" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val hex1 = substring(md5(col("doc_id").cast(StringType)), 1, 1)
      val wh = java.nio.file.Files.createTempDirectory("etl_up_part").toString
      val store = new IndexStore(s, wh)
      store.bulkImportPartitioned(docs, "docs_part", "doc_id", "source")
      val updated = docs.filter(hex1.isin("0", "1", "2", "3"))
        .select(col("doc_id"), lit("xx").as("lang"),
          when(hex1.isin("0", "1"), lit("srcmoved")).otherwise(col("source"))
            .as("source"),
          (col("n_chars") + 1000L).as("n_chars"))
      val added = docs.filter(hex1.isin("e", "f"))
        .select((col("doc_id") + 1000000L).as("doc_id"), lit("new").as("lang"),
          lit("srcnew").as("source"), col("n_chars"))
      store.upsertPartitioned(updated.unionByName(added),
        "docs_part", "doc_id", "source")
      store.read("docs_part")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id").cast(LongType))
    }),

    // SCD Type-2 history — the warehouse extension of the reference's
    // last-write-wins upsert (#4): instead of keeping only the latest
    // version, every version gets a validity interval
    // (valid_from, valid_to] via lead() over the key, and the open
    // interval marks the current row. The update batch is derived
    // in-query (FIXTURES.md pattern): a content-hash-selected ~1/3 of
    // customers receives an account-balance adjustment as version 2.
    // One window per key over version-compacted rows — at scale this
    // runs per merge batch, never over full history.
    "etl_scd2_history" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val isUpdated =
        substring(md5(col("c_custkey").cast(StringType)), 1, 1)
          .isin("0", "1", "2", "3", "4")
      val v1 = cust.select(col("c_custkey"), col("c_acctbal"), lit(1).as("version"))
      val v2 = cust.filter(isUpdated)
        .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"),
          lit(2).as("version"))
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("version"))
      v1.unionByName(v2)
        .withColumn("valid_to", lead(col("version"), 1).over(w))
        .select(col("c_custkey"), col("c_acctbal"),
          col("version").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    // #12: count(*) per "index" — the reference's unimplemented
    // getIndexDataCount (ElasticServiceImpl.java:133-136), owned natively.
    "etl_count_tables" -> ((s, dir) => {
      Tables.all
        .map(n => Tables(s, dir, n).agg(count(lit(1)).as("cnt")).select(lit(n).as("tbl"), col("cnt")))
        .reduce(_.unionAll(_))
        .orderBy(col("tbl"))
    }),

    // #2 extended: schema discovery -> CONTENT discovery. The
    // reference reads ResultSetMetaData per import
    // (BulkProcessImpl.java:102,113-114); a warehouse also needs the
    // data profile under the schema — per column: null count, exact
    // distinct count, min/max (stringified; the reference's value
    // domain). ONE aggregation pass over the table computes every
    // column's stats (partial+final hash agg, no per-column rescans),
    // then the 1-row result unpivots driver-side to a row per column.
    "etl_profile_table" -> ((s, dir) => {
      val df = Tables(s, dir, "orders")
      // TWO fused aggregation passes, not one (r14): fusing the
      // countDistincts with the min/max aggregates forced the WHOLE
      // operator onto SortAggregate — a string min/max has an
      // immutable agg buffer, so the fused plan sorted the Expand's
      // n_cols+1 × rows frame by its 7 grouping keys twice (measured
      // 5.4 s at sf0.1, the family's slowest entry). Split, the
      // distinct pass is a pure HashAggregate dedup (group keys may
      // be var-length; there are no agg buffers until the final
      // count) and the plain pass is a single-group SortAggregate
      // with NO sort (no grouping keys ⇒ no required ordering) —
      // same exact results, one row each, joined below. At 100 TB
      // the distinct pass is the same one-shuffle hash dedup, minus
      // the two corpus-scale sorts.
      val plainAggs = count(lit(1)).as("n_rows") +: df.columns.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        min(col(c)).cast(StringType).as(s"mn_$c"),
        max(col(c)).cast(StringType).as(s"mx_$c"))).toSeq
      val distinctAggs = df.columns.map(c => countDistinct(col(c)).as(s"nd_$c")).toSeq
      val row = df.agg(plainAggs.head, plainAggs.tail: _*)
        .crossJoin(broadcast(df.agg(distinctAggs.head, distinctAggs.tail: _*)))
      val perCol = df.columns.map(c => struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_str"),
        col(s"mx_$c").as("max_str")))
      row.select(explode(array(perCol: _*)).as("p"))
        .select(col("p.col_name"), col("p.n_null"), col("p.n_distinct"),
          col("p.min_str"), col("p.max_str"))
        .orderBy(col("col_name"))
    }),

    // Declarative data-quality rule suite (the Deequ shape, Schelter
    // et al. VLDB'18 — "unit tests for data"): each rule compiles to a
    // violation COUNT over one table scan or one anti-join, and the
    // report row carries (violations, total, ppm, passed). Five rule
    // kinds over the star schema: PK uniqueness, FK referential
    // integrity (broadcast anti-join — the dim side; at 100 TB the
    // fact side streams), domain membership, range, completeness —
    // plus one deliberately drifted bound (qty ≤ 40 against a max-50
    // generator) so the FAILED reporting path is exercised, not just
    // asserted green. Each count is one aggregation (the per-table
    // rules could fuse into one pass per table; kept separate for rule
    // independence — each is metadata-sized output).
    "etl_quality_rules" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val li = Tables(s, dir, "lineitem")
      def rule(name: String, violations: DataFrame, total: DataFrame): DataFrame =
        violations.crossJoin(broadcast(total)) // 1-row aggregate
          .select(lit(name).as("rule"), col("violations"), col("total"),
            expr("violations * 1000000 DIV total").as("violation_ppm"),
            (col("violations") === 0).as("passed"))
      val rules = Seq(
        rule("customer_acctbal_complete",
          cust.agg(count(when(col("c_acctbal").isNull, 1)).as("violations")),
          cust.agg(count(lit(1)).as("total"))),
        rule("lineitem_discount_range_0_01",
          li.agg(count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1))
            .as("violations")),
          li.agg(count(lit(1)).as("total"))),
        rule("lineitem_qty_upper_40",
          li.agg(count(when(col("l_quantity") > 40, 1)).as("violations")),
          li.agg(count(lit(1)).as("total"))),
        rule("orders_fk_customer",
          ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_anti")
            .agg(count(lit(1)).as("violations")),
          ord.agg(count(lit(1)).as("total"))),
        rule("orders_pk_unique",
          ord.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations")),
          ord.agg(count(lit(1)).as("total"))),
        rule("orders_status_domain",
          ord.agg(count(when(!col("o_orderstatus").isin("O", "F", "P"), 1))
            .as("violations")),
          ord.agg(count(lit(1)).as("total"))))
      rules.reduce(_.unionAll(_)).orderBy(col("rule"))
    }),

    // #10: catalog list + system-index filter (leading-dot names dropped,
    // ElasticServiceImpl.java:97-101). Directory listing is a driver-side
    // catalog op (same as spark.catalog.listTables) — not a data scan.
    "etl_catalog_list" -> ((s, dir) => {
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName)
        .filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet").toLowerCase)
        .filterNot(_.startsWith("."))
        .toSeq.sorted
      names.toDF("index_name")
    }),

    // Schema evolution across ingest batches — the ops reality of a
    // long-lived corpus: batch 2 ships a column batch 1 never had.
    // Parquet + `mergeSchema` gives the union schema with old rows
    // null-filled (the Avro/warehouse semantics); at 100 TB mergeSchema
    // reads ONE footer per distinct file schema, not the data, and the
    // scan itself stays pruned/pushed as usual. The two batches are
    // (re)written deterministically under the corpus artifact root each
    // run, so the query is self-contained and idempotent.
    "etl_schema_evolution" -> ((s, dir) => {
      val root = IndexStore.artifactRoot(dir) + "/schema_evo"
      val nation = Tables(s, dir, "nation")
      nation.select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(s"$root/batch=1")
      nation.select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"),
          length(col("n_name")).as("n_name_len"))
        .write.mode("overwrite").parquet(s"$root/batch=2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/batch=1", s"$root/batch=2")
        .orderBy(col("n_nationkey"))
    }),

    // Snapshot time-travel read — the recovery drill behind ES
    // `_snapshot`: import, snapshot, then DESTRUCTIVELY delete-by-query
    // on the live index, and prove the snapshot still serves the
    // pre-delete state without a restore (zero-copy scan of the
    // immutable snapshot directory). The store rebuilds from scratch
    // each run (deterministic content ⇒ idempotent), exercising
    // bulkImport → snapshot → deleteWhere → readSnapshot end to end.
    "etl_snapshot_read" -> ((s, dir) => {
      val root = IndexStore.artifactRoot(dir) + "/tt_store"
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new IndexStore(s, root)
      store.bulkImport(Tables(s, dir, "nation"), "nations_tt", "n_nationkey")
      val snap = store.snapshot("nations_tt")
      store.deleteWhere("nations_tt", col("n_regionkey") === "0")
      store.readSnapshot("nations_tt", snap).orderBy(col("n_name"))
    }),

    // Snapshot DIFF — change-data-capture between a point-in-time
    // snapshot and the live index: after a delete-by-query, an
    // update-by-query and an upsert batch, one full-outer join on the
    // document key classifies every row insert/update/delete/
    // unchanged. This is the audit view time travel exists to answer
    // ("what changed since s1?") and the change-feed a downstream
    // consumer replays; at scale it is one co-partitioned equi-join
    // between two immutable parquet trees. Store rebuilt
    // deterministically per run like etl_snapshot_read.
    "etl_snapshot_diff" -> ((s, dir) => {
      val root = IndexStore.artifactRoot(dir) + "/tt_diff"
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new IndexStore(s, root)
      store.bulkImport(Tables(s, dir, "nation"), "nations_cdc", "n_nationkey")
      val snap = store.snapshot("nations_cdc")
      store.deleteWhere("nations_cdc", col("n_regionkey") === "0")
      store.updateWhere("nations_cdc", col("n_regionkey") === "1",
        Map("n_name" -> concat(col("n_name"), lit("_v2"))))
      store.upsert(
        Tables(s, dir, "nation").filter(col("n_regionkey") === 2)
          .select((col("n_nationkey") + 100).as("n_nationkey"),
            col("n_name"), col("n_regionkey")),
        "nations_cdc", "n_nationkey")
      val old = store.readSnapshot("nations_cdc", snap)
        .select(col("n_nationkey"), col("n_name").as("old_name"), lit(1).as("in_old"))
      val live = store.read("nations_cdc")
        .select(col("n_nationkey"), col("n_name").as("new_name"), lit(1).as("in_new"))
      old.join(live, Seq("n_nationkey"), "full_outer")
        .withColumn("change_type",
          when(col("in_old").isNull, "insert")
            .when(col("in_new").isNull, "delete")
            .when(col("old_name") =!= col("new_name"), "update")
            .otherwise("unchanged"))
        .select(col("n_nationkey"), col("change_type"),
          col("old_name"), col("new_name"))
        .orderBy(col("n_nationkey").cast(IntegerType), col("change_type"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "etl_bulk_import_stringify" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
        |       CAST(l_partkey AS VARCHAR) AS l_partkey,
        |       CAST(l_suppkey AS VARCHAR) AS l_suppkey,
        |       CAST(l_linenumber AS VARCHAR) AS l_linenumber,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS l_quantity,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS l_extendedprice,
        |       CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR) AS l_discount,
        |       CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR) AS l_tax,
        |       l_returnflag, l_linestatus,
        |       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate
        |FROM lineitem
        |ORDER BY 1,2,3,4,5,6,7,8,9,10,11""".stripMargin,
    "etl_upsert_last_write_wins" ->
      """SELECT * FROM lineitem
        |QUALIFY row_number() OVER (
        |  PARTITION BY l_orderkey, l_linenumber
        |  ORDER BY l_shipdate DESC, l_extendedprice DESC, l_partkey DESC,
        |           l_suppkey DESC, l_quantity DESC, l_discount DESC,
        |           l_tax DESC, l_returnflag DESC, l_linestatus DESC) = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // The expected post-merge state recomputed directly from documents:
    // updates override in place, moves just change `source`, inserts
    // append re-keyed rows. All columns VARCHAR to match the engine's
    // stringified bulk-import contract.
    "etl_upsert_partitioned" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, n_chars,
        |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        |  FROM documents),
        |merged AS (
        |  SELECT doc_id,
        |    CASE WHEN h IN ('0','1','2','3') THEN 'xx' ELSE lang END AS lang,
        |    CASE WHEN h IN ('0','1') THEN 'srcmoved' ELSE source END AS source,
        |    CASE WHEN h IN ('0','1','2','3') THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new', 'srcnew', n_chars
        |  FROM base WHERE h IN ('e','f'))
        |SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source,
        |       CAST(n_chars AS VARCHAR) AS n_chars
        |FROM merged ORDER BY merged.doc_id""".stripMargin,
    "etl_scd2_history" ->
      """WITH v AS (
        |  SELECT c_custkey, c_acctbal, 1 AS version FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 100.0, 2 FROM customer
        |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
        |        IN ('0','1','2','3','4'))
        |SELECT c_custkey, c_acctbal, version AS valid_from,
        |  lead(version) OVER (PARTITION BY c_custkey ORDER BY version) AS valid_to,
        |  lead(version) OVER (PARTITION BY c_custkey ORDER BY version) IS NULL AS is_current
        |FROM v
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "etl_count_tables" ->
      ("SELECT 'region' AS tbl, count(*) AS cnt FROM region" +
        Seq("nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")
          .map(t => s" UNION ALL SELECT '$t', count(*) FROM $t").mkString +
        " ORDER BY tbl"),
    "etl_profile_table" ->
      (Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .map(c =>
          s"""SELECT '$c' AS col_name,
             |  count(*) - count($c) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_str,
             |  CAST(max($c) AS VARCHAR) AS max_str
             |FROM orders""".stripMargin)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")),
    // The catalog op's twin: the driver populates the fixture dir
    // deterministically from the TABLES set, so the expected listing is
    // a VALUES literal of graft.Tables.all — an exact-match check on
    // the catalog contents instead of the weaker rows-only check.
    "etl_catalog_list" ->
      Tables.all.map(_.toLowerCase).sorted
        .map(n => s"('$n')")
        .mkString("SELECT index_name FROM (VALUES ", ", ",
          ") AS t(index_name) ORDER BY index_name"),
    // Union schema with batch-1 rows null-filled for the new column.
    "etl_schema_evolution" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INT) AS n_name_len
        |FROM nation
        |UNION ALL
        |SELECT n_nationkey + 100, n_name, CAST(len(n_name) AS INT)
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    // The snapshot serves the FULL pre-delete import (stringified).
    "etl_snapshot_read" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation ORDER BY n_name""".stripMargin,
    // Reconstruct both sides of the diff from the base table and the
    // same three mutations, then the same full-outer classification.
    "etl_snapshot_diff" ->
      """WITH old AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
        |         n_name AS old_name
        |  FROM nation),
        |new AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
        |    CASE WHEN n_regionkey = 1 THEN n_name || '_v2'
        |         ELSE n_name END AS new_name
        |  FROM nation WHERE n_regionkey <> 0
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS VARCHAR), n_name
        |  FROM nation WHERE n_regionkey = 2)
        |SELECT coalesce(o.n_nationkey, n.n_nationkey) AS n_nationkey,
        |  CASE WHEN o.n_nationkey IS NULL THEN 'insert'
        |       WHEN n.n_nationkey IS NULL THEN 'delete'
        |       WHEN o.old_name <> n.new_name THEN 'update'
        |       ELSE 'unchanged' END AS change_type,
        |  o.old_name, n.new_name
        |FROM old o FULL OUTER JOIN new n ON o.n_nationkey = n.n_nationkey
        |ORDER BY CAST(coalesce(o.n_nationkey, n.n_nationkey) AS INT),
        |         change_type""".stripMargin,
    // One SELECT per rule, same violation predicates, same integer ppm.
    "etl_quality_rules" ->
      """SELECT * FROM (
        |SELECT 'customer_acctbal_complete' AS rule,
        |  CAST(count(*) FILTER (c_acctbal IS NULL) AS BIGINT) AS violations,
        |  CAST(count(*) AS BIGINT) AS total,
        |  CAST(count(*) FILTER (c_acctbal IS NULL) * 1000000 // count(*) AS BIGINT) AS violation_ppm,
        |  count(*) FILTER (c_acctbal IS NULL) = 0 AS passed
        |FROM customer
        |UNION ALL
        |SELECT 'lineitem_discount_range_0_01',
        |  CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.1) * 1000000 // count(*) AS BIGINT),
        |  count(*) FILTER (l_discount < 0 OR l_discount > 0.1) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_qty_upper_40',
        |  CAST(count(*) FILTER (l_quantity > 40) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (l_quantity > 40) * 1000000 // count(*) AS BIGINT),
        |  count(*) FILTER (l_quantity > 40) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_fk_customer',
        |  CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (c.c_custkey IS NULL) * 1000000 // count(*) AS BIGINT),
        |  count(*) FILTER (c.c_custkey IS NULL) = 0
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'orders_pk_unique',
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST((count(*) - count(DISTINCT o_orderkey)) * 1000000 // count(*) AS BIGINT),
        |  count(*) - count(DISTINCT o_orderkey) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'orders_status_domain',
        |  CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) * 1000000 // count(*) AS BIGINT),
        |  count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) = 0
        |FROM orders
        |) ORDER BY rule""".stripMargin
  )
}
