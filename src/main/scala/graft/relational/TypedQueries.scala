package graft.relational

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface (SURVEY.md §1.3: case-class Encoders
  * where type safety helps) + the Aggregator UDAF API.
  *
  * The typed path compiles filters/maps against case classes — schema
  * drift becomes a compile error instead of a runtime
  * AnalysisException. Cost note (why the engine keeps most hot paths
  * untyped): typed lambdas are opaque to Catalyst, so filters stop
  * pushing into the scan; fine for business logic, wrong for scan-
  * dominated 100 TB queries. The Aggregator below keeps exactness by
  * accumulating cents as Long (no float order-dependence at all).
  */
object TypedQueries {

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double, l_tax: Double,
                      l_returnflag: String, l_linestatus: String,
                      l_shipdate: java.sql.Timestamp)

  /** Exact quantity sum: Long cents accumulator — order-independent
    * and overflow-safe to ~9e16 cents (9e14 units), far past any
    * per-group 100 TB total for bounded quantities.
    */
  val qtyCentsSum: Aggregator[Lineitem, Long, Double] =
    new Aggregator[Lineitem, Long, Double] {
      def zero: Long = 0L
      def reduce(b: Long, a: Lineitem): Long = b + math.round(a.l_quantity * 100)
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(b: Long): Double = b / 100.0
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typed pipeline: case-class Dataset -> typed filter -> groupByKey
    // -> custom Aggregator + typed count.
    "rel_typed_agg" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables(s, dir, "lineitem").as[Lineitem]
      ds.filter((l: Lineitem) => l.l_quantity >= 10.0)
        .groupByKey((l: Lineitem) => (l.l_returnflag, l.l_linestatus))
        .agg(qtyCentsSum.toColumn.name("sum_qty"))
        .map { case ((flag, status), sumQty) => (flag, status, sumQty) }
        .toDF("l_returnflag", "l_linestatus", "sum_qty")
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "rel_typed_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
        |FROM lineitem WHERE l_quantity >= 10.0
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
