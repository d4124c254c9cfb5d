package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** S2 parity: the reference's query channel is a live Postgres JDBC
  * connection; ours is `Tables.jdbc` (`spark.read.jdbc`). Driven here
  * against embedded Derby (in-memory, zero network) — against Postgres
  * only the URL changes. The load-bearing assertions are pushdown:
  * filters and column pruning must reach the remote database, not run
  * Spark-side over a full-table cursor. */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE items (id BIGINT NOT NULL, name VARCHAR(64), qty INT, price DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"item_$i")
        ps.setInt(3, i % 17); ps.setDouble(4, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("reads a JDBC table with correct schema and values") {
    seeded
    val df = Tables.jdbc(spark, url, "items", props)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "qty", "price"))
    assert(df.count() == 100)
    val r = df.filter(col("ID") === 42).head()
    assert(r.getAs[String]("NAME") == "item_42" && r.getAs[Int]("QTY") == 42 % 17)
  }

  test("predicates push down through the JDBC relation") {
    seeded
    val df = Tables.jdbc(spark, url, "items", props).filter(col("QTY") > 10)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(QTY,10)"), scan)
    assert(df.count() == (1 to 100).count(_ % 17 > 10))
  }

  test("column pruning reaches the JDBC scan (SELECT list, not SELECT *)") {
    seeded
    val df = Tables.jdbc(spark, url, "items", props).select("ID", "QTY")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") || !scan.contains("PRICE"), scan)
  }

  test("partitioned read opens numPartitions range-bounded cursors") {
    seeded
    val df = Tables.jdbcPartitioned(spark, url, "items", "ID", 1L, 100L, 4, props)
    assert(df.rdd.getNumPartitions == 4)
    // range bounds split, they don't filter: all rows present exactly once
    assert(df.count() == 100)
    assert(df.agg(sum("ID")).head().getLong(0) == (1 to 100).sum.toLong)
  }
}
