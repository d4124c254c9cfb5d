package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDrift
import graft.streaming.StreamDrift.{DriftAlert, HourBucket}

/** The online CUSUM monitor: hand-replica equality on a planted drift,
  * no alerts on a stable series, replay idempotence, and live
  * streaming over a MemoryStream of finalized hour buckets arriving
  * across micro-batches (state carried between batches).
  */
class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val (target, slack, h) = (100L, 5L, 50L)

  /** JVM replica of the recursion (the spec's independent truth). */
  private def replica(series: Seq[(Long, Long)], key: String): Seq[DriftAlert] = {
    var (sp, sm) = (0L, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[DriftAlert]
    series.sortBy(_._1).foreach { case (hr, n) =>
      sp = math.max(0L, sp + (n - target) - slack)
      sm = math.max(0L, sm + (target - n) - slack)
      if (sp > h || sm > h) {
        out += DriftAlert(key, hr, n, sp, sm, if (sp > h) "up" else "down")
        if (sp > h) sp = 0L
        if (sm > h) sm = 0L
      }
    }
    out.toSeq
  }

  // type "a": stable at target for 6 h, then rate jumps to 140/h;
  // type "b": stable (±3) throughout — must never alert
  private val drifting = (0L until 6L).map(i => (i, 100L)) ++
    (6L until 12L).map(i => (i, 140L))
  private val stable = (0L until 12L).map(i => (i, 100L + (i % 3) - 1))
  private val buckets =
    drifting.map { case (hr, n) => HourBucket("a", hr, n) } ++
      stable.map { case (hr, n) => HourBucket("b", hr, n) }

  test("batch pass matches the hand replica; stable series never alerts") {
    import spark.implicits._
    val got = StreamDrift.monitor(buckets.toDS(), target, slack, h)
      .collect().sortBy(a => (a.event_type, a.hr)).toSeq
    val want = replica(drifting, "a") ++ replica(stable, "b")
    assert(replica(stable, "b").isEmpty)
    assert(got == want.sortBy(a => (a.event_type, a.hr)))
    assert(got.nonEmpty && got.forall(_.direction == "up"))
    // drift starts at hour 6 (35/h excess over target+slack) → the
    // +35·2 = 70 > 50 crossing lands at hour 7
    assert(got.head.hr == 7L)
  }

  test("streaming across micro-batches equals the single batch pass, replay included") {
    import spark.implicits._
    val stream = MemoryStream[HourBucket](spark)
    val q = StreamDrift.monitor(stream.toDS(), target, slack, h)
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    // three micro-batches; the third REPLAYS hours 6-8 of "a" (a
    // recovered upstream re-delivering finalized windows) — the
    // monitor must ignore them
    stream.addData(buckets.filter(_.hr < 5): _*)
    q.processAllAvailable()
    stream.addData(buckets.filter(b => b.hr >= 5 && b.hr < 9): _*)
    q.processAllAvailable()
    stream.addData(buckets.filter(b => b.hr >= 9) ++
      buckets.filter(b => b.event_type == "a" && b.hr >= 6 && b.hr < 9): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("drift_out").as[DriftAlert]
      .collect().sortBy(a => (a.event_type, a.hr)).toSeq
    val batch = StreamDrift.monitor(buckets.toDS(), target, slack, h)
      .collect().sortBy(a => (a.event_type, a.hr)).toSeq
    assert(streamed == batch)
  }

  test("hourly() emits finalized (type, hr, n) buckets in append mode") {
    import spark.implicits._
    val base = 1700002800000L // hour-aligned
    case class Ev2(ts: Timestamp, event_type: String)
    val stream = MemoryStream[(Timestamp, String)](spark)
    val q = StreamDrift.hourly(
        stream.toDF().toDF("ts", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_out").start()
    // hour 0: three events; then an hour-2 event pushes the watermark
    // past hour 0's end so its window finalizes
    stream.addData(
      (new Timestamp(base + 60000L), "a"),
      (new Timestamp(base + 120000L), "a"),
      (new Timestamp(base + 180000L), "b"))
    q.processAllAvailable()
    stream.addData((new Timestamp(base + 2L * 3600000L + 900000L), "a"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hourly_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val hr0 = base / 3600000L
    assert(rows == Set(("a", hr0, 2L), ("b", hr0, 1L)))
  }
}
