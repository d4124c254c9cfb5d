package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q2's accuracy contract: the GK sketch at accuracy=1000 lands
  * within ±0.1% rank error; on this distribution that bounds the p50
  * value between the exact p49 and p51 (and so on per quantile).
  * q2 itself emits bracket booleans the DuckDB oracle hash-checks;
  * this spec asserts those booleans AND re-derives the bracket from
  * the raw `approx_percentile` output independently, so a bug in q2's
  * own bracket arithmetic can't self-certify. */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q2 bracket booleans all hold") {
    val rows = SparkEntry.queries("q2_approx_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok50") && r.getAs[Boolean]("ok95") &&
        r.getAs[Boolean]("ok99"),
        s"GK estimate out of bracket for ${r.getAs[String]("flag")}")
    }
  }

  test("raw GK estimates sit inside independently computed exact rank brackets") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val rows = li.groupBy(col("l_returnflag").as("flag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("ap"),
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.94)").as("lo95"),
        expr("percentile(l_extendedprice, 0.96)").as("hi95"))
      .select(col("flag"), col("ap")(0).as("ap50"), col("ap")(1).as("ap95"),
        col("lo50"), col("hi50"), col("lo95"), col("hi95"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap50, ap95) = (r.getAs[Double]("ap50"), r.getAs[Double]("ap95"))
      assert(ap50 >= r.getAs[Double]("lo50") && ap50 <= r.getAs[Double]("hi50"),
        s"p50 out of bracket for ${r.getAs[String]("flag")}")
      assert(ap95 >= r.getAs[Double]("lo95") && ap95 <= r.getAs[Double]("hi95"),
        s"p95 out of bracket for ${r.getAs[String]("flag")}")
    }
  }
}
