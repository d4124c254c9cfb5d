package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin.{cms_build, cms_query}

/** Count-Min guarantees, distributed: estimates never underestimate,
  * the sketch is exactly mergeable (counter sums), small vocabularies
  * resolve exactly, and the two-piece build/query surface works from
  * plain SQL through GraftExtensions. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("never underestimates; exact for a vocabulary far below the width") {
    import spark.implicits._
    val tokens = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.HashExprs.tokenize(col("text"))).as("tok"))
    val truth = tokens.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val sketch = tokens.agg(cms_build(col("tok"), w = 1 << 14, d = 4).as("sk"))
    val est = sketch.crossJoin(tokens.distinct())
      .select(col("tok"), cms_query(col("sk"), col("tok")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.keySet == truth.keySet)
    est.foreach { case (tok, e) =>
      assert(e >= truth(tok), s"underestimate for $tok: $e < ${truth(tok)}")
    }
    // vocabulary ≪ width ⇒ collisions are rare: the large majority of
    // estimates must be exact, and total overestimate tiny
    val exact = est.count { case (tok, e) => e == truth(tok) }
    assert(exact >= est.size * 9 / 10, s"only $exact/${est.size} exact")
    val over = est.map { case (tok, e) => e - truth(tok) }.sum.toDouble
    assert(over / truth.values.sum <= 0.05, s"overestimate mass $over too large")
  }

  test("partial sketches merge to exactly the single-pass sketch") {
    import spark.implicits._
    val data = (1 to 5000).map(i => s"k${i % 97}").toDF("k")
    // one partition vs many: same sketch bytes — counter sums are
    // order- and partitioning-independent
    val one = data.coalesce(1).agg(cms_build(col("k"), 256, 3)).collect()(0).getAs[Array[Byte]](0)
    val many = data.repartition(13).agg(cms_build(col("k"), 256, 3)).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("SQL surface via GraftExtensions; malformed sketch bytes rejected") {
    val shared = SparkTestSession.spark // ensure the context exists
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // the builder reuses the JVM's existing SparkContext — ONLY the
    // extensions differ from the shared test session (no master/appName
    // settings here: they'd be silently ignored)
    val ext =
      try org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        org.apache.spark.sql.SparkSession.setActiveSession(shared)
        org.apache.spark.sql.SparkSession.setDefaultSession(shared)
      }
    ext.range(100).selectExpr("CAST(id % 7 AS BIGINT) AS k")
      .createOrReplaceTempView("cms_in")
    val rows = ext.sql(
      """SELECT k, cms_query(sk, k) AS est FROM
           (SELECT cms_build(k, 64, 3) AS sk FROM cms_in),
           (SELECT DISTINCT k FROM cms_in)
         ORDER BY k""").collect()
    assert(rows.length == 7)
    // ids 0..99 over 7 keys: each key appears 14 or 15 times
    rows.foreach(r => assert(r.getLong(1) >= 14 && r.getLong(1) <= 100))
    val bad = intercept[Exception] {
      ext.sql("SELECT cms_query(CAST('junk' AS BINARY), CAST(1 AS BIGINT))").collect()
    }
    assert(bad.getMessage.contains("not a CMS sketch")
      || bad.getCause != null && bad.getCause.getMessage.contains("not a CMS sketch"))
  }
}
