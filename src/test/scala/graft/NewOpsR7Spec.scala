package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential + structural pins for the round-7 additions beyond
  * their DuckDB oracles:
  *
  *  - t21 bigram-LM novelty: full brute-force Scala replica
  *  - s12 scalar-quantization codes: full brute-force Scala replica
  *  - j7  nearest-event join: brute-force nearest-click per purchase
  *  - a14 higher moments: agrees with Spark's own skewness/kurtosis
  *
  * plus plan-quality gates (no cartesian products, one per-user
  * exchange for j7, map-side partials for a14).
  */
class NewOpsR7Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("t21: brute-force bigram-LM replica matches exactly") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    val bigrams = docs.view.mapValues(ts => ts.sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")).toSeq).toMap
    val cdf = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val v = uni.size
    val expected = bigrams.filter(_._2.nonEmpty).map { case (id, bs) =>
      val ps = bs.map { b =>
        val w1 = b.split(" ")(0)
        (cdf(b) + 1).toDouble / (uni(w1) + v).toDouble
      }
      val rare = bs.count(b => cdf(b) <= 2)
      // mirror the engine spelling: sorted sequential left fold
      val mean = ps.sorted.foldLeft(0.0)(_ + _) / bs.size
      id -> (bs.size.toLong, round4(rare.toDouble / bs.size), round4(1000000.0 * mean))
    }
    val got = SparkEntry.queries("t21_lm_novelty")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, e) <- expected) assert(got(id) == e, s"doc $id: got ${got(id)} want $e")
  }

  test("s12: brute-force scalar-quantization replica matches exactly") {
    val qvs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000.0)).toArray)
      .toMap
    val dims = qvs.values.head.length
    val mn = Array.tabulate(dims)(i => qvs.values.map(_(i)).min)
    val mx = Array.tabulate(dims)(i => qvs.values.map(_(i)).max)
    val got = SparkEntry.queries("s12_sq_codes")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet == qvs.keySet)
    for ((id, qv) <- qvs) {
      val codes = Array.tabulate(dims) { i =>
        if (mx(i) == mn(i)) 0
        else (((qv(i) - mn(i)) * 510 + (mx(i) - mn(i))) / (2 * (mx(i) - mn(i)))).toInt
      }
      assert(codes.forall(c => c >= 0 && c <= 255), s"vec $id codes out of range")
      val err = Array.tabulate(dims) { i =>
        (qv(i) - mn(i)) * 255 - codes(i).toLong * (mx(i) - mn(i))
      }
      val expected = (codes.mkString(","), err.map(e => e * e).sum)
      assert(got(id) == expected, s"vec $id: got ${got(id)} want $expected")
    }
  }

  test("j7: brute-force nearest-click replica matches exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts_ns", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val expected = ev.filter(_._4 == "purchase").flatMap { case (pid, u, pt, _) =>
      val cs = clicksByUser.getOrElse(u, Array.empty)
      if (cs.isEmpty) None
      else {
        // backward frame: clicks at-or-before pt, last in (t, id) order
        val prev = cs.filter(_._3 <= pt).sortBy(c => (c._3, c._1)).lastOption
        val next = cs.filter(_._3 > pt).sortBy(c => (c._3, c._1)).headOption
        val pickPrev = prev.isDefined &&
          (next.isEmpty || (pt - prev.get._3) <= (next.get._3 - pt))
        val (cid, gapNs, dir) =
          if (pickPrev) (prev.get._1, pt - prev.get._3, "before")
          else (next.get._1, next.get._3 - pt, "after")
        Some(pid -> (cid, dir, gapNs / 1000000000L))
      }
    }.toMap
    val got = SparkEntry.queries("j7_nearest_click")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, e) <- expected) assert(got(id) == e, s"purchase $id: got ${got(id)} want $e")
  }

  test("a14: power-sum moments agree with Spark's builtin aggregates") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val builtin = li.groupBy(col("l_returnflag").as("flag"))
      .agg(var_pop("l_quantity").as("v"), skewness("l_quantity").as("sk"),
        (kurtosis("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val got = SparkEntry.queries("a14_higher_moments")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == builtin.keySet)
    for ((flag, (v, sk, ku)) <- builtin) {
      val (gv, gsk, gku) = got(flag)
      assert(math.abs(gv - v) < 1e-3, s"$flag var: $gv vs $v")
      assert(math.abs(gsk - sk) < 1e-3, s"$flag skew: $gsk vs $sk")
      assert(math.abs(gku - ku) < 1e-3, s"$flag kurt: $gku vs $ku")
    }
  }

  test("plan gates: no cartesian products; j7 sorts per user once; a14 partials") {
    def executed(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    for (name <- Seq("t21_lm_novelty", "s12_sq_codes", "j7_nearest_click",
        "a14_higher_moments")) {
      val plan = executed(name)
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
    }
    // j7: both window frames reuse ONE per-user hash exchange (count
    // only the AQE final plan — toString appends the initial plan too)
    val j7full = executed("j7_nearest_click")
    val j7 = j7full.split("== Initial Plan ==")(0)
    val userExchanges = j7.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(user_id")).size
    assert(userExchanges == 1, s"expected one per-user exchange:\n$j7")
    // a14: map-side partial + final aggregate
    val a14 = executed("a14_higher_moments")
    assert("HashAggregate".r.findAllIn(a14).length >= 2, a14)
  }
}
