package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make every graft expression available in
  * plain SQL. `spark.sql.extensions=graft.GraftExtensions` is a STATIC
  * conf (read from the SparkContext at creation), so these tests build
  * the session with `.withExtensions(new GraftExtensions)` — the same
  * Function1 the static conf path instantiates and applies — over the
  * shared context; the shared test session is restored afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("SQL functions resolve and compute through the extensions") {
    val shared = SparkTestSession.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s.sql(
        """SELECT
             char_fold('abc') AS cf,
             format_bytes(CAST(2048 AS BIGINT)) AS fb,
             size(tokenize('  a  b c ')) AS nt,
             dot_long(array(1L, 2L), array(3L, 4L)) AS dot,
             size(shingle_hashes(array(1L, 2L, 3L, 4L), 3)) AS ns,
             token_ngrams(array('x', 'y', 'z'), 2)[0] AS ng,
             size(winnow(array(5L, 1L, 4L), 2)) AS nw,
             subword_count(array('abcdefgh')) AS sw
           """).head()
      val expectedCf = "abc".foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      assert(r.getAs[Long]("cf") == expectedCf)
      assert(r.getAs[String]("fb") == "2.0 KiB")
      assert(r.getAs[Int]("nt") == 3)
      assert(r.getAs[Long]("dot") == 11L)
      assert(r.getAs[Int]("ns") == 2)
      assert(r.getAs[String]("ng") == "x y")
      assert(r.getAs[Int]("nw") == 2)
      assert(r.getAs[Long]("sw") == 2L)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("non-literal arity argument is rejected with a clear error") {
    val shared = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test2")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val e = intercept[Exception] {
        s.sql("SELECT winnow(array(1L), CAST(rand() * 3 AS INT))").collect()
      }
      assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
