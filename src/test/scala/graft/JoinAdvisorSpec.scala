package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinAdvisor

/** The sketches become optimizer inputs (r8 verdict #4): on planted
  * data, [[JoinAdvisor.advise]]'s decision must match what the
  * MEASURED build-side size and hot-key factor dictate, its CMS
  * join-size estimate must satisfy the e9 bracket, and
  * [[JoinAdvisor.execute]] must be row-identical to a plain join
  * under every strategy.
  */
class JoinAdvisorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dim(n: Long) = spark.range(n)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("dname"))

  test("small build side → broadcast, and execute() broadcasts it") {
    val facts = spark.range(200000L)
      .select((col("id") % 100).as("k"), col("id").as("payload"))
    val d = dim(100)
    val a = JoinAdvisor.advise(facts, "k", d, "k")
    assert(a.strategy == "broadcast" && a.buildSide == "right")
    assert(a.leftRows == 200000L && a.rightRows == 100L)

    val joined = JoinAdvisor.execute(facts, "k", d, "k", a)
    assert(joined.count() == facts.join(d, "k").count())
    joined.collect()
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("even key distribution above the broadcast budget → shuffle; " +
    "CMS join-size estimate satisfies the e9 bracket") {
    val left = spark.range(150000L).select((col("id") % 5000).as("k"))
    val right = spark.range(100000L).select((col("id") % 5000).as("k"))
    val a = JoinAdvisor.advise(left, "k", right, "k",
      broadcastRowLimit = 1000L)
    assert(a.strategy == "shuffle", a.toString)
    assert(a.saltFactor == 1)

    // exact |A ⨝ B| = Σ fA(v)·fB(v); CMS never underestimates and
    // per-row overestimates ≤ N_A·N_B/w (w = 4096, ×4 headroom)
    val exact = left.groupBy("k").agg(count(lit(1)).as("ca"))
      .join(right.groupBy("k").agg(count(lit(1)).as("cb")), "k")
      .agg(sum(col("ca") * col("cb"))).collect().head.getLong(0)
    assert(a.estJoinRows >= exact, s"underestimated: ${a.estJoinRows} < $exact")
    assert(a.estJoinRows <= exact + 150000L * 100000L * 4 / 4096 + 20,
      s"estimate out of bracket: ${a.estJoinRows} vs $exact")

    // measured evidence matches: HLL distinct within 5% of 5000
    assert(math.abs(a.probeDistinctKeys - 5000L) <= 250,
      s"distinct estimate off: ${a.probeDistinctKeys}")
  }

  test("planted hot key → salted_shuffle whose factor matches the measured skew") {
    // half the fact rows share key 7; the rest spread over 5000 keys
    val facts = spark.range(200000L)
      .select(when(col("id") % 2 === 0, 7L).otherwise(col("id") % 5000).as("k"),
        col("id").as("payload"))
    val d = dim(20000) // above the broadcast budget
    val a = JoinAdvisor.advise(facts, "k", d, "k", broadcastRowLimit = 1000L)

    // measured ground truth
    val counts = facts.groupBy("k").agg(count(lit(1)).as("n"))
    val exactHot = counts.orderBy(col("n").desc).limit(1).collect().head
    val exactDistinct = counts.count()
    val exactMean = 200000L / exactDistinct

    assert(a.strategy == "salted_shuffle", a.toString)
    assert(a.hotKey.contains(exactHot.getLong(0).toString),
      s"Misra-Gries missed the planted hot key: ${a.hotKey}")
    // CMS point estimate brackets the exact hot count
    assert(a.hotKeyCnt >= exactHot.getLong(1))
    assert(a.hotKeyCnt <= exactHot.getLong(1) + 200000L * 4 / 4096 + 20)
    // the decision recomputed from MEASURED numbers is the same
    val exactSalt = math.min(16L,
      math.max(1L, exactHot.getLong(1) / (4L * exactMean))).toInt
    assert(a.saltFactor == exactSalt,
      s"advised salt ${a.saltFactor} != measured-skew salt $exactSalt")

    // execute() under salting is row-identical to the plain join
    val salted = JoinAdvisor.execute(facts, "k", d, "k", a)
    val plain = facts.join(dim(20000).withColumnRenamed("k", "k"), "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("payload")).collect().head.getLong(0) ==
      plain.agg(sum("payload")).collect().head.getLong(0))
  }

  test("skewed probe on the RIGHT → salted_shuffle salts the right side " +
    "and replicates (explodes) the SMALL left side") {
    // mirror of the planted-hot-key case with the sides swapped: the
    // r9 flaw salted `left` unconditionally, replicating the huge
    // skewed side ×saltFactor — amplifying the very skew the advice
    // diagnosed. The exploded side must be the small build side.
    val facts = spark.range(200000L)
      .select(when(col("id") % 2 === 0, 7L).otherwise(col("id") % 5000).as("k"),
        col("id").as("payload"))
    val d = dim(20000)
    val a = JoinAdvisor.advise(d, "k", facts, "k", broadcastRowLimit = 1000L)
    assert(a.strategy == "salted_shuffle", a.toString)
    assert(a.buildSide == "left", a.toString)
    assert(a.hotKey.contains("7"), a.toString)

    val joined = JoinAdvisor.execute(d, "k", facts, "k", a)
    joined.collect()
    // the Generate (explode ×saltFactor) must sit over the SMALL dim
    // side — its subtree carries `dname`, never the fact `payload`
    val plan = joined.queryExecution.executedPlan.toString
    val genLine = plan.linesIterator.find(_.contains("Generate explode"))
    assert(genLine.isDefined, plan)
    assert(genLine.get.contains("dname") && !genLine.get.contains("payload"),
      s"exploded side is not the small build side: ${genLine.get}")

    // row-identical to the plain join, column order pinned
    val plain = d.join(facts, "k")
    assert(joined.count() == plain.count())
    assert(joined.agg(sum("payload")).collect().head.getLong(0) ==
      plain.agg(sum("payload")).collect().head.getLong(0))
    assert(joined.columns.toSeq == Seq("k", "dname", "payload"))
  }

  test("broadcast budget counts PHYSICAL rows; per-key stats count " +
    "non-null keys only") {
    // 50k physical rows but only 500 non-null keys: the broadcast
    // would ship all 50k rows, so the budget must see 50k (a non-null
    // count of 500 <= limit advising broadcast here is the driver-OOM
    // path); the mean/hot statistics meanwhile must NOT be diluted by
    // the 49.5k null rows that can never join
    val left = spark.range(50000L)
      .select(when(col("id") % 100 === 0, col("id") % 500).as("k"))
    val d = dim(100000)
    val a = JoinAdvisor.advise(left, "k", d, "k", broadcastRowLimit = 1000L)
    assert(a.leftRows == 50000L, a.toString) // physical, not non-null
    assert(a.strategy != "broadcast", s"null-heavy 50k-row side broadcast: $a")
  }

  test("uniform probe side does NOT trigger salting even above the budget") {
    val left = spark.range(120000L).select((col("id") % 3000).as("k"))
    val d = dim(20000)
    val a = JoinAdvisor.advise(left, "k", d, "k", broadcastRowLimit = 1000L)
    assert(a.strategy == "shuffle",
      s"uniform keys must not salt: $a")
  }

  test("salted execute tolerates sides sharing a non-key column name " +
    "(positional reorder, like every other strategy)") {
    val facts = spark.range(200000L)
      .select(when(col("id") % 2 === 0, 7L).otherwise(col("id") % 5000).as("k"),
        col("id").as("v")) // both sides carry a column named "v"
    val d = spark.range(20000L).select(col("id").as("k"), (col("id") * 2).as("v"))
    val a = JoinAdvisor.advise(d, "k", facts, "k", broadcastRowLimit = 1000L)
    assert(a.strategy == "salted_shuffle" && a.buildSide == "left", a.toString)
    val joined = JoinAdvisor.execute(d, "k", facts, "k", a)
    assert(joined.columns.toSeq == Seq("k", "v", "v")) // key, left v, right v
    assert(joined.count() == d.join(facts, "k").count())
  }

  test("adviseJoinOrder puts the most selective dimension first, estimates " +
    "bracket the exact join sizes, and executeChain is row-identical") {
    import JoinAdvisor.ChainDim
    // fact: 100k rows, keys ka in [0,1000), kb in [0,200)
    val fact = spark.range(100000L).select(
      (col("id") % 1000).as("ka"), (col("id") % 200).as("kb"),
      col("id").as("payload"))
    // selective dim: matches only ka < 20 → |fact ⋈ a| = 2000
    val a = spark.range(20L).select(col("id").as("da"), lit("A").as("ta"))
    // wide dim: every kb matches → |fact ⋈ b| = 100000
    val b = spark.range(200L).select(col("id").as("db"), lit("B").as("tb"))
    val dims = Seq(
      ChainDim("selective", "ka", a, "da"),
      ChainDim("wide", "kb", b, "db"))
    val order = JoinAdvisor.adviseJoinOrder(fact, dims)
    assert(order.map(_._1) == Seq("selective", "wide"), order.toString)
    // e9's CM bracket per estimate: never under, over ≤ 4·Na·Nb/w
    val exact = Map("selective" -> 2000L, "wide" -> 100000L)
    order.foreach { case (n, est) =>
      assert(est >= exact(n), s"$n underestimated: $est < ${exact(n)}")
      val na = 100000L
      val nb = if (n == "selective") 20L else 200L
      assert(est <= exact(n) + na * nb * 4 / 4096 + 20,
        s"$n estimate out of bracket: $est vs ${exact(n)}")
    }
    // chain output = plain fixed-order join output
    val chained = JoinAdvisor.executeChain(fact, dims)
    val plain = fact
      .join(a, col("ka") === col("da")).join(b, col("kb") === col("db"))
    assert(chained.count() == plain.count())
    assert(chained.agg(sum("payload")).collect().head.getLong(0) ==
      plain.agg(sum("payload")).collect().head.getLong(0))
  }
}
