package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The two join shapes that decide 100 TB viability, asserted at the
  * physical-plan level (the correctness of the rows is the oracle
  * gate's job; these specs pin the DISTRIBUTION of the work).
  *
  *  - bucketed co-located join: pre-bucketed tables join with zero
  *    shuffle — write-once layout cost, exchange-free every join after;
  *  - runtime bloom-filter pruning: a selective dimension filter is
  *    pushed (as a bloom filter on the join key) into the fact scan,
  *    so non-joining fact rows die before the exchange instead of
  *    shuffling 99% dead weight.
  */
class ScaleJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    Tables.saveBucketed(
      Tables.load(spark, sf, "orders"), "orders_b", s"$dir/orders_b", "o_orderkey", 8)
    Tables.saveBucketed(
      Tables.load(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", s"$dir/lineitem_b", "o_orderkey", 8)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the merge path
      "spark.sql.adaptive.enabled" -> "false" // stable plan for assertion
    ) {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "o_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.collect()
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the only exchange allowed is the one UNDER the aggregation
      // (3 status groups); the join itself must read co-numbered
      // buckets directly — no exchange below the SortMergeJoin
      val planStr = joined.queryExecution.executedPlan.toString
      val joinIdx = planStr.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, planStr)
      assert(!planStr.substring(joinIdx).contains("Exchange"), planStr)
      assert(exchanges.size <= 1, planStr)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local test files are KB-scale; drop the "is the fact side big
      // enough to bother" threshold so injection triggers
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val orders = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT") // selective dim filter
      val fact = Tables.load(spark, sf, "lineitem")
      val joined = fact.join(orders, fact("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      // fact scan gated by the dim-built bloom filter before its exchange
      assert(planStr.contains("might_contain"), planStr)
      assert(planStr.contains("bloom_filter_agg"), planStr)
    }
  }
}
