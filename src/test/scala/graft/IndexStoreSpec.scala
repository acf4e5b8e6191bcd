package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end index lifecycle: the reference's CLI flow (§3.1 —
  * create → bulk import → count) against a temp warehouse, plus the
  * invariants its logs checked manually: imported count == source
  * distinct-key count, and re-import idempotence.
  */
class IndexStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def newStore = {
    val root = java.nio.file.Files.createTempDirectory("graft_idx").toString
    new etl.IndexStore(spark, root)
  }

  test("create / list / delete with system-index filtering") {
    val store = newStore
    store.createIndex("Orders") // lowercased like the reference
    store.createIndex(".kibana") // system index — hidden from listing
    assert(store.listIndexes() == Seq("orders"))
    store.deleteIndex("orders")
    assert(store.listIndexes() == Seq.empty)
  }

  test("bulk import: count == distinct keys, all values stringified") {
    val store = newStore
    val orders = Tables(spark, sf, "orders")
    val n = store.bulkImport(orders, "ORDERS", "o_orderkey")
    assert(n == orders.select("o_orderkey").distinct().count())
    assert(store.read("orders").schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("re-import is idempotent (last-write-wins on the id)") {
    val store = newStore
    val orders = Tables(spark, sf, "orders")
    val n1 = store.bulkImport(orders, "orders", "o_orderkey")
    // Re-import the same table unioned with itself: duplicate ids must
    // collapse to the same count, like ES _id overwrite.
    val n2 = store.bulkImport(orders.unionAll(orders), "orders", "o_orderkey")
    assert(n1 == n2)
    val a = store.read("orders").orderBy(col("o_orderkey")).collect()
    store.bulkImport(orders, "orders", "o_orderkey")
    val b = store.read("orders").orderBy(col("o_orderkey")).collect()
    assert(a.sameElements(b), "same input must produce identical surviving docs")
  }
}
