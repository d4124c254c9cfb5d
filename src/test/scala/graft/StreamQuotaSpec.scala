package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQuota
import graft.streaming.StreamQuota.{Admitted, Doc}

/** Lifetime quota admission across micro-batches: the counter must
  * persist between batches, stop exactly at the quota, and assign
  * dense 1-based ranks per stratum. */
class StreamQuotaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("admits at most `quota` docs per stratum across batches, FIFO") {
    import spark.implicits._
    val in = MemoryStream[Doc](spark)
    val q = StreamQuota.quotaAdmit(in.toDS(), quota = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_admitted").start()
    try {
      in.addData(
        Doc(5, "en", "a"), Doc(1, "en", "b"), Doc(2, "de", "c"))
      q.processAllAvailable()
      in.addData(
        Doc(3, "en", "d"), Doc(4, "en", "e"), // en hits quota at 3
        Doc(6, "de", "f"))
      q.processAllAvailable()
      in.addData(Doc(7, "en", "g"), Doc(8, "de", "h"), Doc(9, "de", "i"))
      q.processAllAvailable()

      val got = spark.table("quota_admitted").as[Admitted].collect()
        .sortBy(a => (a.lang, a.rankInStratum))
      val en = got.filter(_.lang == "en")
      val de = got.filter(_.lang == "de")
      // en: batch1 admits 1,5 (doc_id order); batch2 admits 3 then quota full
      assert(en.map(_.doc_id).toSeq == Seq(1L, 5L, 3L))
      assert(en.map(_.rankInStratum).toSeq == Seq(1L, 2L, 3L))
      // de: 2, then 6, then 8 — doc 9 rejected at quota
      assert(de.map(_.doc_id).toSeq == Seq(2L, 6L, 8L))
      assert(de.map(_.rankInStratum).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("composed ingest: the decontamination guard runs BEFORE quota admission") {
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val shingles = graft.streaming.StreamGuards.benchmarkShingles(bench)

    val in = MemoryStream[Doc](spark)
    // stateless guard first, stateful quota second — a contaminated
    // doc must never consume a quota slot
    val guarded = graft.streaming.StreamGuards
      .decontaminated(in.toDF, shingles, minHits = 3).as[Doc]
    val q = StreamQuota.quotaAdmit(guarded, quota = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("guarded_quota").start()
    try {
      in.addData(
        Doc(10, "en", benchText + " extra tail"), // contaminated — must not take a slot
        Doc(11, "en", "clean one two three four five"),
        Doc(12, "en", "clean six seven eight nine ten"),
        Doc(13, "en", "clean eleven twelve thirteen fourteen"))
      q.processAllAvailable()
      val admitted = spark.table("guarded_quota")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      // both slots go to clean docs: 11, 12 (doc_id order within batch)
      assert(admitted.toSeq == Seq(11L, 12L))
    } finally q.stop()
  }
}
