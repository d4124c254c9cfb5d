package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q2's accuracy contract: the GK sketch at accuracy=1000 lands
  * within ±0.1% rank error; on this distribution that bounds the p50
  * value between the exact p49 and p51 (and so on per quantile). */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q2 approx quantiles sit inside exact rank brackets") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val brackets = li.groupBy(col("l_returnflag").as("flag"))
      .agg(
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.94)").as("lo95"),
        expr("percentile(l_extendedprice, 0.96)").as("hi95"))
    val rows = SparkEntry.queries("q2_approx_quantiles")(spark, sf)
      .join(brackets, "flag").collect()
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
