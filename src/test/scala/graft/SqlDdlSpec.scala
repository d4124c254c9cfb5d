package graft

import org.scalatest.funsuite.AnyFunSuite

/** S4 parity depth: the reference drives its stores through SQL DDL +
  * DML over psql (reference quickstart_prepare_peers.sh:16–49,
  * insert.ps1:259–330). The same statements must work through the
  * `spark.sql` channel against the session catalog: CREATE/DROP
  * namespace, CREATE TABLE, multi-row INSERT, INSERT SELECT, UPDATE-
  * equivalent (INSERT OVERWRITE), and introspection (SHOW/DESCRIBE). */
class SqlDdlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("DDL/DML round-trip through the SQL channel") {
    val sql = spark.sql(_: String)
    sql("CREATE DATABASE IF NOT EXISTS graft_src")
    try {
      sql("""CREATE TABLE graft_src.customers (
               id INT, first_name STRING, last_name STRING, email STRING)
             USING parquet""")
      // multi-row VALUES insert — the reference's batched-insert shape
      sql("""INSERT INTO graft_src.customers VALUES
             (1, 'a', 'x', 'a@x.test'), (2, 'b', 'y', 'b@y.test'),
             (3, 'c', 'z', 'c@z.test')""")
      assert(sql("SELECT COUNT(*) FROM graft_src.customers").collect()(0).getLong(0) == 3)

      // MAX+1 key generation read (reference insert.ps1 key pattern)
      val next = sql(
        "SELECT COALESCE(MAX(id), 0) + 1 AS next_id FROM graft_src.customers")
        .collect()(0).getAs[Int]("next_id")
      assert(next == 4)

      // INSERT SELECT across tables in the namespace
      sql("""CREATE TABLE graft_src.emails USING parquet
             AS SELECT id, email FROM graft_src.customers WHERE id <= 2""")
      assert(sql("SELECT COUNT(*) FROM graft_src.emails").collect()(0).getLong(0) == 2)

      // INSERT OVERWRITE = the batch-update spelling for immutable files
      sql("""INSERT OVERWRITE graft_src.emails
             SELECT id, email FROM graft_src.customers""")
      assert(sql("SELECT COUNT(*) FROM graft_src.emails").collect()(0).getLong(0) == 3)

      // introspection parity (\dt / \d equivalents). SHOW TABLES also
      // lists the session's TEMP VIEWS (isTemporary=true) — other
      // suites register corpus views on the shared session, so filter
      // to the namespace's own tables
      val tables = sql("SHOW TABLES IN graft_src").collect()
        .filterNot(_.getBoolean(2)).map(_.getString(1)).toSet
      assert(tables == Set("customers", "emails"))
      val cols = sql("DESCRIBE TABLE graft_src.customers")
        .collect().map(_.getString(0)).filterNot(_.startsWith("#")).toSet
      assert(Set("id", "first_name", "last_name", "email").subsetOf(cols))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_src CASCADE")
    }
  }
}
