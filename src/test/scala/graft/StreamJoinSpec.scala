package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Click(click_id: Long, user: Long, click_ts: Timestamp)
case class Purchase(purchase_id: Long, buyer: Long, purchase_ts: Timestamp)

/** Stream-stream interval join with watermarks on both sides —
  * purchase attribution to a prior click within 1 hour. State on each
  * side is bounded by the watermark + interval, so the join runs
  * indefinitely at constant memory (the 100 TB streaming shape). */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val base = 1700002800000L
  private def t(min: Long) = new Timestamp(base + min * 60000)

  test("purchases join clicks within the attribution window only") {
    import spark.implicits._
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)

    val joined = clicks.toDF().withWatermark("click_ts", "2 hours")
      .join(
        purchases.toDF().withWatermark("purchase_ts", "2 hours"),
        expr("""user = buyer AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 1 HOUR"""))
      .select("click_id", "purchase_id", "user")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()

    clicks.addData(
      Click(1, 100, t(0)),    // → purchase at t+30 attributes
      Click(2, 100, t(300)),  // no purchase within window
      Click(3, 200, t(10)))   // different user
    purchases.addData(
      Purchase(11, 100, t(30)),   // within 1h of click 1
      Purchase(12, 100, t(200)),  // > 1h after click 1, before click 2
      Purchase(13, 200, t(65)))   // within 1h of click 3
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (3L, 13L)), s"got $got")
  }

  test("LEFT OUTER stream-stream join emits null-padded unmatched clicks after watermark") {
    import spark.implicits._
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)

    // outer side must wait until the watermark proves no match can
    // still arrive — the null-padded row is emitted ONLY then. This is
    // the semantics funnel-drop analysis needs: "clicks that never
    // converted", streamed, with bounded state.
    val joined = clicks.toDF().withWatermark("click_ts", "10 minutes")
      .join(
        purchases.toDF().withWatermark("purchase_ts", "10 minutes"),
        expr("""user = buyer AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 1 HOUR"""),
        "leftOuter")
      .select("click_id", "purchase_id", "user")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()

    clicks.addData(Click(1, 100, t(0)), Click(2, 300, t(5)))
    purchases.addData(Purchase(11, 100, t(30)))
    q.processAllAvailable()
    // advance both watermarks far past click 2's join window
    clicks.addData(Click(9, 999, t(600)))
    purchases.addData(Purchase(99, 998, t(600)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // click 1 matched; click 2 expired unmatched → null purchase_id
    assert(rows.contains((1L, 11L)), s"got ${rows.mkString(",")}")
    assert(rows.contains((2L, -1L)), s"got ${rows.mkString(",")}")
  }
}
