package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Layout evidence for hive-partitioned writes: a filter on the
  * partition column is resolved at PLANNING time (PartitionFilters in
  * the scan, zero data files from other partitions opened), and
  * dynamic partition overwrite replaces only the partitions present in
  * the incoming batch — the idempotent daily-ingest contract. */
class PartitionLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeDated(dir: String) = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("d", to_date(col("ts")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("d"))
    Tables.savePartitioned(ev, dir, "d")
    ev
  }

  test("partition pruning: a date filter reads only that partition's files") {
    val dir = Files.createTempDirectory("partlayout").toString + "/ev"
    val ev = writeDated(dir)
    val dates = ev.select(date_format(col("d"), "yyyy-MM-dd"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(dates.length > 1, "need multiple partitions for pruning evidence")
    val pick = dates(dates.length / 2)

    val q = spark.read.parquet(dir).filter(col("d") === lit(pick))
    val plan = q.queryExecution.executedPlan.toString

    // pruning happens in the scan's PartitionFilters, not a post-scan Filter
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("isnotnull(d"), plan)

    // every file actually read lives under the picked partition's directory
    val filesRead = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty)
    assert(filesRead.forall(_.contains(s"d=$pick")), filesRead.mkString("\n"))

    // and the rows are exactly the partition's rows
    assert(q.count() == ev.filter(col("d") === lit(pick)).count())
  }

  test("dynamic partition overwrite replaces only the incoming day") {
    val dir = Files.createTempDirectory("partdyn").toString + "/ev"
    val ev = writeDated(dir)
    val dates = ev.select(date_format(col("d"), "yyyy-MM-dd"))
      .distinct().collect().map(_.getString(0)).sorted
    val target = dates(0)
    val before = spark.read.parquet(dir)
    val nTotal = before.count()
    val nTarget = before.filter(col("d") === lit(target)).count()
    assert(nTarget > 0)

    // re-ingest ONE day with a sentinel payload
    val replacement = ev.filter(col("d") === lit(target))
      .withColumn("value", lit(-1.0))
      .limit(10)
    Tables.overwritePartitions(replacement, dir, "d")

    val after = spark.read.parquet(dir)
    // the target day now holds only the 10 sentinel rows …
    assert(after.filter(col("d") === lit(target)).count() == 10)
    assert(after.filter(col("d") === lit(target) && col("value") =!= -1.0).count() == 0)
    // … and every other day is byte-for-byte untouched
    assert(after.filter(col("d") =!= lit(target)).count() == nTotal - nTarget)
    assert(after.filter(col("value") === -1.0).count() == 10)
  }
}
