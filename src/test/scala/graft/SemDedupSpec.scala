package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for s17 (SemDeDup keep list) beyond its DuckDB oracle: a
  * driver-side brute-force replica of the full pipeline (exact integer
  * cell assignment → within-cell cosine pairs → union-find CC → min-id
  * reps), plus the keep-list invariants a dedup consumer relies on:
  * total coverage (every vector verdict-ed), rep closure (each rep
  * keeps itself), and pair soundness (a kept pair is never cosine-dup
  * within one cell).
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s17 keep list matches a brute-force union-find replica; invariants hold") {
    val vs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val arr = r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray
        (r.getLong(0), arr)
      }.sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val seeds = vs.filter(_._1 < 8)
    // exact integer L2 cell assignment, (dist2, cid) tie-break
    val cellOf = vs.map { case (vid, arr) =>
      vid -> seeds.map { case (cid, cv) =>
        val d2 = arr.indices.map(i => (arr(i) - cv(i)) * (arr(i) - cv(i))).sum
        (d2, cid)
      }.min._2
    }.toMap
    // within-cell cosine >= 0.40 pairs -> union-find
    val norm = vs.map { case (vid, arr) => vid -> math.sqrt(dot(arr, arr).toDouble) }.toMap
    val parent = scala.collection.mutable.Map(vs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for {
      (da, va) <- vs; (db, vb) <- vs
      if da < db && cellOf(da) == cellOf(db)
      if dot(va, vb) / (norm(da) * norm(db)) >= 0.40
    } {
      val (ra, rb) = (find(da), find(db))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = vs.map { case (vid, _) =>
      val rep = find(vid)
      (vid, cellOf(vid), rep, rep == vid)
    }.toSeq
    val got = SparkEntry.queries("s17_semdedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected)
    // coverage: one verdict per vector
    assert(got.length == vs.length)
    // rep closure: every rep_id is itself kept
    val keptIds = got.filter(_._4).map(_._1).toSet
    assert(got.forall(r => keptIds.contains(r._3)))
    // the list actually deduplicates something at this SF
    assert(keptIds.size < vs.length)
  }
}
