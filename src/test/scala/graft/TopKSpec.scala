package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK

/** topk_keys must equal the sort-based reference under any grouping,
  * any partitioning (merge path), duplicate ordering values (tie
  * break toward the larger key), k larger than the group, and null
  * inputs. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reference(rows: Seq[(Long, Long, Long)], k: Int): Map[Long, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._3, r._2)).sorted(
        Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse).take(k).map(_._2)
    }

  private def viaAgg(rows: Seq[(Long, Long, Long)], k: Int, parts: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    rows.toDF("g", "key", "ord")
      .repartition(parts) // exercises partial heaps + shuffle merge
      .groupBy("g")
      .agg(TopK.topk_keys(col("key"), col("ord"), k).as("topk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
  }

  test("matches the sort-based reference across random data, k, and partitioning") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 20).foreach { _ =>
      // small ord range → plenty of ties; distinct triples keep the
      // reference multiset-insensitive
      val rows = Seq.fill(120)(
        (rnd.nextInt(5).toLong, rnd.nextInt(300).toLong, rnd.nextInt(20).toLong)).distinct
      val k = 1 + rnd.nextInt(8)
      val parts = 1 + rnd.nextInt(7)
      assert(viaAgg(rows, k, parts) == reference(rows, k),
        s"mismatch at k=$k parts=$parts")
    }
  }

  test("k larger than group, ties break toward larger key, nulls ignored") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), Some(5L)), (1L, Some(11L), Some(5L)), (1L, Some(12L), Some(4L)),
      (2L, Some(7L), Some(1L)), (2L, None, Some(9L)), (2L, Some(8L), None))
      .toDF("g", "key", "ord")
    val out = df.groupBy("g")
      .agg(TopK.topk_keys(col("key"), col("ord"), 2).as("topk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // g=1: ord 5 tie → 11 beats 10; g=2: null key / null ord rows drop
    assert(out == Map(1L -> Seq(11L, 10L), 2L -> Seq(7L)))
  }

  test("SQL registration via GraftExtensions") {
    // extensions bind at session construction (static conf path), so
    // build a child session with them, as GraftExtensionsSpec does
    val shared = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s.implicits._
      Seq((1L, 1L, 3L), (1L, 2L, 9L), (1L, 3L, 6L)).toDF("g", "key", "ord")
        .createOrReplaceTempView("tk_in")
      val out = s.sql(
        "SELECT g, topk_keys(key, ord, 2) AS topk FROM tk_in GROUP BY g")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(out == Map(1L -> Seq(2L, 3L)))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    }
  }
}
