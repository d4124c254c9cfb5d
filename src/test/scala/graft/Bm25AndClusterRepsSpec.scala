package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Differential specs for t17 (BM25 retrieval) and d8 (cluster
  * representatives): each result is recomputed independently on the
  * driver from the raw sf0.001 parquet, so the Spark plan, the
  * integer-BM25 algebra, and the d5→d8 aggregation are pinned by
  * something other than the DuckDB oracle they also have.
  */
class Bm25AndClusterRepsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("t17 BM25 matches a driver-side BigInt recomputation") {
    val qterms = Set("spark", "join", "vector")
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
    val nDocs = BigInt(docs.length)
    val tToks = docs.map(d => BigInt(d._2.length)).sum
    // tf per (doc, term in query), df per term
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(qterms).groupBy(identity).map { case (t, g) =>
        (id, t, BigInt(g.length), BigInt(toks.length))
      }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> BigInt(g.length) }
    val expected = tf
      .map { case (id, t, f, dl) =>
        val d = df(t)
        val c = ((2 * nDocs - 2 * d + 1) * 22 * f * tToks * 10000) /
          ((2 * d + 1) * (10 * tToks * f + 3 * tToks + 9 * nDocs * dl))
        (id, c)
      }
      .groupBy(_._1).map { case (id, g) => (id, g.map(_._2).sum, g.size.toLong) }
      .toSeq.sortBy { case (id, s, _) => (-s, id) }.take(20)
      .map { case (id, s, n) => (id, s.toLong, n) }
    val got = SparkEntry.queries("t17_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "query terms must occur in the sf0.001 corpus")
  }

  test("t17 plan: df/stats broadcast, top-20 is TakeOrderedAndProject") {
    val df = SparkEntry.queries("t17_bm25")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"tiny df/stats sides must broadcast, not shuffle the token stream: $plan")
  }

  test("d8 representatives are d5's cluster minima with exact sizes and metadata") {
    val d5 = SparkEntry.queries("d5_dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_id)
    val byCluster = d5.groupBy(_._2)
    // cluster_id is already MIN(member) — d8 reps must be exactly those
    val expected = byCluster.map { case (cid, members) =>
      assert(cid == members.map(_._1).min, s"cluster $cid label is not its min member")
      cid -> members.length.toLong
    }
    val meta = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    val got = SparkEntry.queries("d8_cluster_reps")(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (rep, n) = (r.getLong(0), r.getLong(1))
      assert(n == expected(rep), s"cluster $rep size")
      assert((r.getString(2), r.getString(3), r.getLong(4)) == meta(rep),
        s"representative $rep metadata must come from its documents row")
    }
    // members dropped by keeping one rep per cluster = Σ(n−1)
    assert(expected.values.map(_ - 1).sum == d5.length - expected.size)
  }

  test("s8 semantic clusters: reps are cluster minima, labels from embeddings") {
    val got = SparkEntry.queries("s8_semantic_clusters")(spark, sf).collect()
    assert(got.nonEmpty, "bucketed cosine pairs must exist at sf0.001")
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      val (rep, n) = (r.getLong(0), r.getLong(1))
      assert(n >= 2, s"a cluster has at least one edge, so ≥2 members: $rep")
      assert(r.getInt(2) == labels(rep), s"label of rep $rep")
    }
    // representatives are distinct cluster ids
    assert(got.map(_.getLong(0)).distinct.length == got.length)
  }
}
