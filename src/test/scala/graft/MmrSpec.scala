package graft

import org.scalatest.funsuite.AnyFunSuite

/** s22_mmr_rerank — maximal-marginal-relevance rerank against a
  * plain-Scala replica on identically quantized arithmetic, plus the
  * structural guarantees: distinct picks, pool membership, the seed is
  * the pure-relevance argmax, and the rerank actually DIVERSIFIES
  * (selected-set max pairwise sim ≤ the pure-top-5's, on this corpus
  * strictly less or equal by construction of the objective). */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s22: greedy replica matches exactly; picks distinct, from the " +
    "pool, seeded at max relevance") {
    val out = graft.operators.SimilarityQueries
      .queries("s22_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1 to 5))
    assert(out.map(_._2).distinct.length == 5, "distinct picks")

    // replica on identically quantized vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }
    def ppm(a: Long, b: Long, d: Long): Long =
      math.floor(d / (norm(a) * norm(b)) * 1000000.0).toLong
    // NOTE argument order mirrors the engine: rel = anchor·cand with
    // denominator anchorNorm*candNorm; sim = cand·sel, candNorm*selNorm
    val rel = vecs.keys.filter(_ > 0).map { id =>
      id -> math.floor(
        dot(vecs(0L), vecs(id)) / (norm(0L) * norm(id)) * 1000000.0).toLong
    }.toMap
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(20)
    var sel = Vector(pool.head)
    for (_ <- 2 to 5) {
      val cand = pool.filterNot(p => sel.exists(_._1 == p._1))
      val scored = cand.map { case (id, r) =>
        val ms = sel.map(s =>
          ppm(id, s._1, dot(vecs(id), vecs(s._1)))).max
        (id, r, 7L * r - 3L * ms)
      }
      val best = scored.minBy { case (id, _, sc) => (-sc, id) }
      sel = sel :+ ((best._1, best._2))
    }
    val replicaIds = sel.map(_._1)
    assert(out.map(_._2).toVector == replicaIds,
      s"engine ${out.map(_._2).toSeq} vs replica $replicaIds")
    assert(out.head._4 == 7L * out.head._3, "seed score is pure relevance")
    assert(out.head._3 == pool.head._2, "seed is the relevance argmax")

    // diversification: the MMR set's max internal sim must not exceed
    // the pure-relevance top-5's (the objective trades relevance for
    // exactly this)
    def maxInternalSim(ids: Seq[Long]): Long =
      ids.combinations(2).map { case Seq(a, b) =>
        ppm(a, b, dot(vecs(a), vecs(b))) }.max
    val pureTop5 = pool.take(5).map(_._1)
    assert(maxInternalSim(replicaIds) <= maxInternalSim(pureTop5),
      "MMR must not be LESS diverse than the pure top-k")
  }
}
