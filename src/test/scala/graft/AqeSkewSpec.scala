package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew mitigation evidence: with AQE's skew-join handling on
  * (the default), a sort-merge join against a heavily skewed key is
  * re-planned at runtime — the oversized partition splits into
  * several tasks (`skew=true` in the executed plan) with no manual
  * salting. This is the first line of defense at 100 TB; the manual
  * salted-join ([[graft.operators.Skew]]) remains for joins AQE can't
  * rewrite (e.g. some outer-join shapes).  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // Dedicated child session: shares the SparkContext but has its own
    // SQLConf, so the skew-threshold overrides below can never leak
    // into suites running concurrently on the shared test session.
    val spark = SparkTestSession.spark.newSession()
    import spark.implicits._
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    // thresholds scaled down so a ~MB-sized test partition counts as skewed
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.shuffle.partitions", "8")
    // 95% of fact rows share key 0; dim is uniform
    val fact = spark.range(200000)
      .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
    // global (partial-only) aggregate downstream: a grouped agg ON
    // THE JOIN KEY would reuse the join's partitioning, and AQE
    // declines to split the skewed partition when that breaks a
    // required distribution (unless forceOptimizeSkewedJoin)
    val joined = fact.join(dim, "k").agg(sum(col("payload") + col("w")).as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"expected a skew-split SMJ, got:\n$plan")
  }
}
