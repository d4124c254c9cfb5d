package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

case class Ev(ts: Timestamp, event_type: String, value: Double)

/** Streaming/batch unification: the same EventWindows transform run as
  * a Structured Streaming query over a MemoryStream must produce the
  * batch result, and the watermark must drop too-late events. */
class EventWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // hour-aligned base so window starts are predictable
  private val base = 1700002800000L
  private def t(min: Long) = new Timestamp(base + min * 60000)

  private val data = Seq(
    Ev(t(0), "click", 1.0), Ev(t(10), "click", 2.0), Ev(t(40), "view", 3.0),
    Ev(t(70), "click", 4.0), Ev(t(90), "view", 5.0), Ev(t(130), "click", 6.0))

  test("streaming tumbling agg equals batch tumbling agg") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark)
    stream.addData(data: _*)
    val q = EventWindows.tumbling(stream.toDF(), withWatermarkCol = true)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventWindows.tumbling(data.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops events later than the bound in append mode") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark)
    val q = EventWindows.tumbling(stream.toDF(), withWatermarkCol = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    // batch 1: events up to minute 130 → watermark advances to 120
    stream.addData(data: _*)
    q.processAllAvailable()
    // batch 2: an event at minute 5 — far behind the watermark; its
    // window [0,60) is already closed and emitted, so it must be dropped
    stream.addData(Ev(t(5), "click", 100.0))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to flush every window
    stream.addData(Ev(t(1000), "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
    val firstWindow = out.filter(col("window_start") === base / 1000)
      .agg(sum("total")).collect().head.getDouble(0)
    // 1.0 + 2.0 + 3.0 from the original events; the late 100.0 dropped
    assert(firstWindow == 6.0, s"late event leaked into closed window: $firstWindow")
  }

  test("session windows run in streaming mode with watermark") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark)
    stream.addData(
      Ev(t(0), "u1", 1.0), Ev(t(10), "u1", 1.0),  // one session
      Ev(t(60), "u1", 1.0),                        // gap 50m → new session
      Ev(t(0), "u2", 1.0))
    val sess = stream.toDF()
      .withColumn("user_id", $"event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
    val q = sess.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out")
      .groupBy("user_id").count().orderBy("user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("u1", 2L), ("u2", 1L)))
  }

  test("sessions merge within gap and split beyond it") {
    import spark.implicits._
    val evs = Seq(
      (1L, t(0)), (1L, t(10)), (1L, t(20)),     // one session (gaps 10m)
      (1L, t(60)),                              // new session (gap 40m)
      (2L, t(0)), (2L, t(45))                   // two sessions
    ).map { case (u, ts) => (u, ts, "x", 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventWindows.sessions(evs).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 4L, 3L), (2L, 2L, 2L, 1L)))
  }

  test("streaming HLL sketch merges across micro-batches like one batch") {
    import spark.implicits._
    // users 1-300 in window 0, 200-400 in window 1; delivered in THREE
    // separate micro-batches with overlap, so per-window state must
    // register-max-merge partial sketches, not just accumulate rows
    def uev(min: Long, u: Long) = (t(min), u)
    val b1 = (1L to 150L).map(u => uev(5, u))
    val b2 = (100L to 300L).map(u => uev(30, u)) // overlaps b1 in window 0
    val b3 = (200L to 400L).map(u => uev(70, u)) // window 1
    val all = (b1 ++ b2 ++ b3).toDF("ts", "user_id")

    val stream = MemoryStream[(Timestamp, Long)](spark)
    val q = EventWindows.distinctUsersHll(
        stream.toDF().toDF("ts", "user_id"), withWatermarkCol = true)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    stream.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hll_out")
      .orderBy("window_start").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = EventWindows.distinctUsersHll(all)
      .orderBy("window_start").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // identical estimates: incremental merge is lossless
    assert(streamed == batch)
    // and the estimates are near-exact at this cardinality (LC regime)
    val est = streamed.map(_._2)
    assert(est.length == 2)
    assert(math.abs(est(0) - 300L) <= 5, s"window0=$est")
    assert(math.abs(est(1) - 201L) <= 5, s"window1=$est")
  }
}
