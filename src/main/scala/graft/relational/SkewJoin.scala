package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join — the manual remedy for key skew that AQE's skew-join
  * splitting can't reach (e.g. a single hot key inside one task of a
  * non-sort-merge join, or pre-AQE engines).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, saltFactor) derived from a hash of the whole row — spreading
  * one hot key over saltFactor shuffle partitions; the other side is
  * exploded saltFactor× so every (key, salt) pair still meets its
  * match. Cost: saltFactor× replication of the small side — the
  * classic trade of replication for balance. Salt is
  * hash-deterministic (never `rand()`), so results are reproducible
  * and retries are safe.
  */
object SkewJoin {

  def salted(skewed: DataFrame, other: DataFrame, skewedKey: String,
             otherKey: String, saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val exploded = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded,
        salted(skewedKey) === exploded(otherKey) &&
          salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }
}
