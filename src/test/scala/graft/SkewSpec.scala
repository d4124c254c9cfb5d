package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join returns row-identical results to a plain join") {
    import spark.implicits._
    // 90% of facts hit one hot key
    val facts = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = facts.join(dim, Seq("k")).orderBy("payload")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(facts, dim, "k", saltFactor = 8).orderBy("payload")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salt assignment is deterministic — retry-safe, no rand()") {
    import spark.implicits._
    // a shuffle-fetch failure recomputes the map task; with rand()
    // the recomputed rows would draw different salts and rows could
    // double or vanish across the join. The content-hash salt must
    // give bit-identical bucket assignment on every evaluation.
    val facts = spark.range(5000)
      .select((col("id") % 50).as("k"), col("id").as("payload"))
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    def run() = Skew.saltedJoin(facts, dim, "k", saltFactor = 8)
      .orderBy("payload").collect().map(_.toSeq).toSeq
    assert(run() == run())
    // and the plan carries no non-deterministic expression at all
    val plan = Skew.saltedJoin(facts, dim, "k", 8)
      .queryExecution.analyzed
    def allDeterministic(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.expressions.forall(_.deterministic) && p.children.forall(allDeterministic)
    assert(allDeterministic(plan), plan.toString)
  }

  test("skew profile surfaces the heavy hitter") {
    import spark.implicits._
    val facts = spark.range(1000)
      .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id")).as("k"))
    val prof = Skew.keySkewProfile(facts, "k", topN = 3).collect()
    assert(prof.head.getLong(0) == 7L)
    assert(prof.head.getAs[Double]("share_pct") >= 89.0)
  }
}
