package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for s17 (SemDeDup keep list) beyond its DuckDB oracle: a
  * driver-side brute-force replica of the full pipeline — 2-round
  * Lloyd centroids with TWO-LEVEL routed assignment (coarse = first
  * ⌈√k⌉ centroids; a vector scores only its winning coarse cell's
  * fine centroids), then within-cell cosine pairs → union-find CC →
  * min-id reps — plus the keep-list invariants a dedup consumer
  * relies on: total coverage (every vector verdict-ed), rep closure
  * (each rep keeps itself), and actual deduplication at this SF.
  * Every arithmetic step is the exact integer trajectory the engine
  * runs (quantized millionths, truncating integer-mean division), so
  * the replica is an independent second implementation, not a
  * tautology.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Driver-side replica of IvfIndex.lloydCentroids + routeAssign:
    * returns vec_id → routed cell under the learned centroids. */
  private def lloydRouteReplica(vs: Array[(Long, Array[Long])], k: Int,
      rounds: Int): Map[Long, Long] = {
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var cents: Map[Long, Array[Long]] =
      vs.filter(_._1 < k).map { case (id, arr) => id -> arr }.toMap
    def routeOnce(): Map[Long, Long] = {
      // fine → coarse: each fine centroid's nearest of the first-kc
      val f2c = cents.map { case (cid, cv) =>
        cid -> (0L until kc).map(cc => (d2(cv, cents(cc)), cc)).min._2
      }
      vs.map { case (vid, arr) =>
        val ccid = (0L until kc).map(cc => (d2(arr, cents(cc)), cc)).min._2
        val cell = cents.keys.toSeq.filter(f2c(_) == ccid)
          .map(cid => (d2(arr, cents(cid)), cid)).min._2
        vid -> cell
      }.toMap
    }
    for (_ <- 1 to rounds) {
      val assign = routeOnce()
      val byCell = vs.groupBy(v => assign(v._1))
      cents = cents.map { case (cid, cv) =>
        cid -> byCell.get(cid).map { members =>
          val n = members.length.toLong
          // truncating integer mean — Spark DIV / DuckDB // semantics
          cv.indices.map(i => members.map(_._2(i)).sum / n).toArray
        }.getOrElse(cv)
      }
    }
    routeOnce()
  }

  test("s17 keep list matches a brute-force Lloyd+routing replica; invariants hold") {
    val vs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val arr = r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray
        (r.getLong(0), arr)
      }.sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    // k = max(8, ceil(N/256)) — 8 at this SF; kc = 3
    val cellOf = lloydRouteReplica(vs, k = 8, rounds = 2)
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
