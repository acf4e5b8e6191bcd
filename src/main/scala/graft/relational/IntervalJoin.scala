package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Bounded-interval (time-range) join: for each left event, all right
  * events of the same key within (left.ts, left.ts + window].
  *
  * Spark plans a raw `a.ts < b.ts AND b.ts <= a.ts + w` condition as a
  * nested-loop per key — quadratic in the hot key. The scalable form
  * used here buckets both sides by `window`-sized time cells and joins
  * on (key, cell) with the right side duplicated into the two cells
  * its matches can come from — an EQUI-join (hash/SMJ, one shuffle)
  * followed by the exact range filter. Join fan-out is bounded by
  * events-per-cell, not events-per-key.
  */
object IntervalJoin {

  /** click → purchase conversions within 30 minutes, per user. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_interval_join_bucketed" -> ((s, dir) => {
      val win = 30 * 60 // seconds
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"),
          (unix_timestamp(col("ts")) / win).cast(LongType).as("cell"))
      // Each purchase can match clicks in its own cell or the previous
      // one — duplicate the purchase row into both (cell, cell-1).
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"),
          explode(array(
            (unix_timestamp(col("ts")) / win).cast(LongType),
            (unix_timestamp(col("ts")) / win).cast(LongType) - 1)).as("cell"))
      clicks.join(purchases,
          col("user_id") === col("p_user") && clicks("cell") === purchases("cell"))
        .filter(col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $win SECONDS"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // The oracle states the SEMANTICS in the naive inequality form —
    // DuckDB can afford it at sf0.01; our plan must produce the same
    // rows from the bucketed equi-join.
    "rel_interval_join_bucketed" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin
  )
}
