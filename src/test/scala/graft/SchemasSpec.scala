package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas

/** Reference data-model parity (FIXTURES.md §A), including the
  * NUMERIC(10,2) rounding behaviour called out as a hard part
  * (SURVEY.md §7.5c). */
class SchemasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("seed rows match the reference quickstart") {
    assert(Schemas.seedCustomers(spark).count() == 4)
    assert(Schemas.seedProducts(spark).count() == 9)
    assert(Schemas.seedOrders(spark).count() == 5)
    // duplicate product names allowed (hammer ×3, lines 64–66)
    val hammers = Schemas.seedProducts(spark).filter(col("name") === "hammer").count()
    assert(hammers == 3)
  }

  test("NUMERIC(10,2): 0.875 rounds to 0.88 like PostgreSQL (HALF_UP)") {
    val w = Schemas.seedProducts(spark)
      .filter(col("id") === 105)
      .select("weight").collect().head.getDecimal(0)
    assert(w.toPlainString == "0.88", s"got $w")
  }

  test("target schema propagates from source through the store sidecar") {
    val root = java.nio.file.Files.createTempDirectory("schema_prop").toString
    val store = new graft.streaming.KeyedParquetStore(root, 2)
    store.snapshot(spark, "products", Schemas.seedProducts(spark), "id")
    val propagated = store.schemaOf(spark, "products")
    assert(propagated == Schemas.seedProducts(spark).schema)
    // decimal survives the round-trip exactly
    val w = store.read(spark, "products").filter(col("id") === 105)
      .select("weight").collect().head.getDecimal(0)
    assert(w.toPlainString == "0.88")
  }

  test("FK metadata closes over the seed data") {
    val orders = Schemas.seedOrders(spark)
    val customers = Schemas.seedCustomers(spark)
    val products = Schemas.seedProducts(spark)
    assert(orders.join(customers, orders("purchaser") === customers("id"), "left_anti").count() == 0)
    assert(orders.join(products, orders("product_id") === products("id"), "left_anti").count() == 0)
  }
}
