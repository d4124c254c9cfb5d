package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** c13 temperature mixing on planted strata: exact integer rate
  * arithmetic (isqrt weights, floor-div ppm, the cap), the α=1/2
  * up-weighting direction, determinism, and schema preservation. */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(strata: (String, Int, Int)*) = {
    import spark.implicits._
    strata.zipWithIndex.flatMap { case ((lang, nDocs, tokensPerDoc), si) =>
      (0 until nDocs).map { i =>
        (si * 1000L + i, lang, Seq.fill(tokensPerDoc)("tok").mkString(" "))
      }
    }.toDF("doc_id", "lang", "text")
  }

  test("exact rates: isqrt weights, floor-div ppm, low-resource cap") {
    // A: mass 4000 (w = 63), B: mass 100 (w = 10); sum_w = 73,
    // budget = 80% of 4100 = 3280.
    //   rateA = 1e6*3280*63 // (73*4000) = 707671  (down-sampled)
    //   rateB = 1e6*3280*10 // (73*100)  > 1e6     (capped)
    val d = docs(("a", 40, 100), ("b", 10, 10))
    val rates = CorpusPipeline.mixRates(d, "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rates("a") == ((40L, 4000L, 63L, 707671L)), rates.toString)
    assert(rates("b") == ((10L, 100L, 10L, 1000000L)), rates.toString)
  }

  test("perfect-square mass: the isqrt correction lands exactly") {
    val d = docs(("a", 1, 10000), ("b", 1, 9999), ("c", 1, 10001))
    val w = CorpusPipeline.mixRates(d, "lang").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(w == Map("a" -> 100L, "b" -> 99L, "c" -> 100L), w.toString)
  }

  test("sample is deterministic, a subset, and schema-preserving") {
    val d = docs(("a", 40, 100), ("b", 10, 10))
    val s1 = CorpusPipeline.temperatureSample(d, "lang")
    assert(s1.columns.toSeq == Seq("doc_id", "lang", "text"))
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusPipeline.temperatureSample(d, "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "non-deterministic sample")
    val all = d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(all) && ids1.size < all.size, s"${ids1.size}")
    // the capped stratum survives whole
    val bIds = d.filter(col("lang") === "b").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(bIds.subsetOf(ids1), "capped stratum must keep every doc")
  }
}
