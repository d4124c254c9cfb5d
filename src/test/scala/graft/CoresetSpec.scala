package graft

import org.scalatest.funsuite.AnyFunSuite

/** s21_coreset — greedy k-center (farthest-first traversal) against a
  * plain-Scala replica on the same quantized vectors, plus the
  * structural invariants the greedy guarantees:
  *
  *  - the selection min-dist sequence is NON-INCREASING (each new
  *    center is the farthest remaining point, so the cover radius
  *    bound only tightens);
  *  - assignment counts conserve N (every vector lands on exactly one
  *    center; each center claims at least itself).
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s21: farthest-first replica matches exactly; min-dist sequence " +
    "non-increasing; assignment conserves N") {
    val out = graft.operators.SimilarityQueries
      .queries("s21_coreset")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1 to 5), "one row per step, ordered")

    // driver-side replica on identically quantized vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val byId = vecs.toMap
    var chosen = Vector((1, vecs.head._1, 0L))
    for (step <- 2 to 5) {
      val cand = vecs.iterator
        .filterNot { case (id, _) => chosen.exists(_._2 == id) }
        .map { case (id, arr) =>
          (id, chosen.map(c => d2(byId(c._2), arr)).min)
        }.toVector
      val (bid, bmd) = cand.maxBy { case (id, md) => (md, -id) }
      chosen = chosen :+ ((step, bid, bmd))
    }
    assert(out.map(t => (t._1, t._2, t._3)).toVector == chosen,
      s"engine ${out.toVector} vs replica $chosen")

    val dists = out.drop(1).map(_._3)
    assert(dists.zip(dists.drop(1)).forall { case (a, b) => a >= b },
      s"min-dist sequence must be non-increasing: ${dists.toSeq}")
    assert(out.map(_._4).sum == vecs.length, "assignment conserves N")
    assert(out.forall(_._4 >= 1L), "every center claims at least itself")
  }
}
