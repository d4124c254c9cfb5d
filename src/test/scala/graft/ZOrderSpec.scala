package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Layout evidence for Z-order clustering: with N files, BOTH
  * clustered dimensions get compact per-file ranges (≈1/√N of the
  * domain), so parquet footer min/max stats prune a point predicate
  * on either column to a small file subset. A plain time-sorted
  * layout prunes only on time — every file spans the full user
  * domain. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("zvalue16 walks nested quadrants and round-trips bit interleave") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zvalue16(col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 0xFFFFFFFFL))
  }

  /** Per-file (min, max) extent of `c`, normalized by the full domain. */
  private def fileSpans(path: String, c: String): Seq[Double] = {
    val df = spark.read.parquet(path)
    val Array(lo, hi) = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
      .collect().toSeq
      .map(r => (r.getDouble(1), r.getDouble(2)))
      .map { case (mn, mx) => (mx - mn) / math.max(hi - lo, 1e-9) }
  }

  /** Files whose [min,max] on `c` contains `v` — what footer-stats
    * pruning would actually read for `WHERE c = v`. */
  private def filesOverlapping(path: String, c: String, v: Double): Int =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
      .filter(col("mn") <= v && col("mx") >= v)
      .count().toInt

  test("z-ordered files are compact in both dims; time-sort only in one") {
    val ev: DataFrame = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_ns"), col("event_type"), col("value"))
    val n = 16

    val zDir = Files.createTempDirectory("zorder").toString + "/ev"
    ZOrder.writeClustered(ev, zDir, n, "user_id", "ts_ns")

    val tDir = Files.createTempDirectory("tsort").toString + "/ev"
    ev.repartitionByRange(n, col("ts_ns")).sortWithinPartitions("ts_ns")
      .write.mode("overwrite").parquet(tDir)

    val zUser = fileSpans(zDir, "user_id")
    val zTime = fileSpans(zDir, "ts_ns")
    val tUser = fileSpans(tDir, "user_id")
    def avg(xs: Seq[Double]) = xs.sum / xs.size

    // z-order: every file covers a bounded rectangle — both dims well
    // under the full domain on average (~1/4 for a 4×4 quadrant grid)
    assert(avg(zUser) <= 0.6, s"z-order user spans too wide: ${avg(zUser)}")
    assert(avg(zTime) <= 0.6, s"z-order time spans too wide: ${avg(zTime)}")
    // time-sort: time is perfectly clustered but user_id is not — each
    // file spans essentially the whole user domain
    assert(avg(tUser) >= 0.9, s"time-sorted files unexpectedly user-clustered: ${avg(tUser)}")

    // the pruning consequence for `WHERE user_id = 3` (sf0.001 has
    // users 0..14; 3 is interior to a quadrant column — the exact
    // mid-domain value would sit ON the curve's top-level split, the
    // Morton worst case): footer stats exclude most z-ordered files,
    // none of the time-sorted ones
    val zHit = filesOverlapping(zDir, "user_id", 3.0)
    val tHit = filesOverlapping(tDir, "user_id", 3.0)
    assert(zHit <= n / 2, s"z-order should prune >half the files, read $zHit/$n")
    assert(tHit == n, s"time-sort prunes nothing on user_id, read $tHit/$n")

    // layout must be content-preserving (same multiset of rows)
    assert(spark.read.parquet(zDir).count() == ev.count())
    assert(spark.read.parquet(zDir).except(ev).isEmpty &&
      ev.except(spark.read.parquet(zDir)).isEmpty)
  }
}
