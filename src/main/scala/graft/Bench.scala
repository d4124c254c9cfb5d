package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line as the very
  * last stdout line.
  *
  * Methodology (repeatability over raw speed of the harness itself):
  *  - per query: one untimed warm run (JIT + codegen cache + parquet
  *    footers), then `SPARK_GRAFT_BENCH_RUNS` (default 3) timed runs,
  *    reported value = median — single-shot numbers at sub-second
  *    scale are dominated by JIT/GC timing, not the plan;
  *  - queries run in sorted-name order (hash-map order made
  *    round-to-round diffs incomparable);
  *  - each run materializes the FULL result through the noop sink
  *    (count() would let Catalyst elide sorts/projections);
  *  - per-query progress goes to stderr; stdout gets only the final
  *    JSON line (values rounded to ms) so a bounded log tail always
  *    contains a complete parse.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // SETTLE before any timing (r15 verdict ask #8): round-close
    // benches have run right after a 10-minute test suite two rounds
    // running and read 13–23% hot purely from box contention (the
    // anchor flagged it, the per-query numbers still misled — the r15
    // a15/a19 false alarm). A GC + short quiesce lets the just-exited
    // suite's page-cache churn and CPU tail drain before the first
    // timed run; the anchor below still quantifies whatever remains.
    val settleMs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MS", "3000").toLong
    def settle(ms: Long): Unit = { System.gc(); Thread.sleep(ms) }
    settle(settleMs)
    // CALIBRATION ANCHOR (r11 verdict ask #4): a fixed synthetic
    // CPU+shuffle workload — generated rows, zero I/O, identical on
    // every box and every round — timed alongside the queries. Bench
    // totals drift ±15-40% with box load/page-cache state on IDENTICAL
    // code (measured r10→r11: 104.1→144.5 s driver-side with untouched
    // queries regressing the most); dividing totals by the anchor
    // separates engine regression from environment drift. Shape:
    // 8M rows → hash project (CPU) → 4096-key groupBy (map-combine +
    // one shuffle) → noop sink; median of 3 after one warm run, like
    // every query.
    def anchorOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, 32)
        // v bounded to 10⁶ so the 8M-row SUM stays inside int64 under
        // ANSI arithmetic (raw 64-bit hash sums overflow)
        .selectExpr("xxhash64(id) % 4096 AS k",
          "abs(xxhash64(id, id + 1) % 1000000) AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("sv"),
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // r13 verdict ask #4: ONE anchor reading carries the box's measured
    // 23% one-day spread — the same round produced two same-day figures
    // 18% apart (259× vs 306×) on identical code. Three interleaved
    // readings (start / after half the queries / end) give the
    // normalized total an error bar: anchor_sec = median of the three
    // medians, anchor_spread = (max−min)/median across them.
    val anchorReadings = scala.collection.mutable.ArrayBuffer.empty[Double]
    // ADAPTIVE settle (r16 verdict ask #2): the fixed 3 s settle did
    // not protect the r16 round-close artifact (anchor_spread 1.025 —
    // the start anchor read the just-exited suite's tail). An anchor
    // triple whose own 3 runs disagree is measuring box churn, not the
    // box: throw it away, settle longer, re-measure — bounded retries
    // so a genuinely busy box still produces an artifact (flagged
    // `degraded` below instead of silently noise-dominated).
    val settleRetries = math.max(0,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_RETRIES", "4").toInt)
    val calmSpread = 0.25 // intra-triple (max−min)/median acceptance
    def measureTriple(label: String): Double = {
      var attempt = 0
      while (true) {
        anchorOnce() // warm
        val ts = Seq.fill(3)(anchorOnce()).sorted
        val intra = if (ts(1) == 0.0) 0.0 else (ts(2) - ts(0)) / ts(1)
        System.err.println(f"[bench] __anchor_$label%s__ median=${ts(1)}%7.3f s  " +
          f"intra_spread=$intra%.3f  " +
          f"runs=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
        if (intra <= calmSpread || attempt >= settleRetries) return ts(1)
        attempt += 1
        System.err.println(s"[bench] __anchor_$label" + "__ unstable " +
          s"(box churning) - settling and retrying ($attempt/$settleRetries)")
        settle(settleMs * (attempt + 1))
      }
      0.0 // unreachable
    }
    def measureAnchor(label: String): Unit = anchorReadings += measureTriple(label)
    // the START anchor is the run's baseline and the one reading with
    // no queries around it to blame: an internally-calm triple can
    // still be sitting on the warmup tail (calm-but-slow — the r17
    // first live run read 0.561 at start vs 0.318 mid/end, a 0.79
    // cross-reading spread on a quiet box). Require it REPRODUCIBLE:
    // two consecutive triples separated by a settle must agree within
    // 20%, else keep settling (bounded) — the later reading wins.
    locally {
      var prev = measureTriple("start")
      var attempt = 0
      var done = false
      while (!done) {
        settle(settleMs)
        val cur = measureTriple("start_confirm")
        if (math.abs(cur - prev) / math.min(cur, prev) <= 0.2 ||
            attempt >= settleRetries) {
          anchorReadings += cur
          done = true
        } else {
          System.err.println(f"[bench] __anchor_start__ not reproducible " +
            f"($prev%.3f vs $cur%.3f) - still warming/churning, retrying " +
            s"(${attempt + 1}/$settleRetries)")
          prev = cur
          attempt += 1
        }
      }
    }
    // Every inventory query is benched (the former d4 demo exclusion
    // is gone — d4 was retired for the bounded-seed d12 lookup in r9).
    // dev loop only: SPARK_GRAFT_BENCH_ONLY=q1,q2 re-times a subset
    // (the driver never sets it, so its runs always cover everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keySet.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.zipWithIndex.map { case (name, qi) =>
      if (names.length >= 4 && qi == names.length / 2) measureAnchor("mid")
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        // Each run builds its plan fresh, so blocks persisted inside the
        // query (localCheckpoint/cache) are never reused by the NEXT run
        // — drop them even when the run THROWS, or runs accumulate dead
        // blocks until the executor heap thrashes (the r3 d-cluster
        // 5-25 s readings were exactly this: checkpoint-heavy queries
        // drowning in leaked blocks + GC). The registry sweep is safe
        // here: Bench owns the whole session, nothing runs concurrently.
        // The timestamp is taken BEFORE the finally so cleanup cost is
        // not attributed to the query.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally {
          // blocking: the sweep runs AFTER the timestamp, so waiting is
          // free for the measurement — and async unpersist let a heavy
          // checkpoint-laden neighbor's blocks linger into the NEXT
          // query's timed runs (graph family read ~1.5x isolated when
          // it followed the d-cluster family; synchronous frees close
          // that gap)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          spark.sharedState.cacheManager.clearCache()
        }
      }
      val med =
        try {
          // Collect the previous query's garbage at the QUERY boundary,
          // BEFORE the warm run — never between timed runs: a full GC
          // clears the soft-referenced codegen/JIT caches, and timing
          // right after one measures recompilation, not the plan
          // (+25% aggregate when the GC sat inside the run loop). Here
          // the warm run rebuilds the caches, timed runs stay clean,
          // and a heavy neighbor's garbage (checkpoint-laden d-family)
          // still can't get attributed to this query's median — the r6
          // x13 reading (0.8 s steady-state, 3.1 s median) was exactly
          // that cross-query noise.
          System.gc()
          once() // warm
          val ts = Seq.fill(runs)(once()).sorted
          val m = ts(ts.length / 2)
          System.err.println(
            f"[bench] $name%-26s median=$m%7.3f s  runs=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
          m
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            -1.0
        }
      name -> med
    }
    if (names.length >= 4) measureAnchor("end")
    val sortedAnchors = anchorReadings.sorted.toSeq
    val anchorSec = sortedAnchors(sortedAnchors.length / 2)
    val anchorSpread =
      if (sortedAnchors.length < 2 || anchorSec == 0.0) 0.0
      else (sortedAnchors.last - sortedAnchors.head) / anchorSec
    // past this cross-reading spread the totals are noise-dominated
    // even after the adaptive settle — say so IN the artifact instead
    // of leaving it to a verdict footnote (r16 wrong #2)
    val degraded = anchorSpread > 0.35
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // one CDC insert-throughput run per full bench (r7 verdict item 4:
    // the reference's only published perf number is 1.04 ops/s insert
    // throughput — give every BENCH_r{N}.json a measured counterpart).
    // Skipped on SPARK_GRAFT_BENCH_ONLY dev-subset runs; excluded from
    // the query `total` (it is a throughput figure, not a query time).
    val cdc: Seq[(String, Double)] =
      if (only.isDefined) Seq.empty
      else try graft.tools.CdcThroughput.measure(spark)
      catch { case e: Throwable =>
        System.err.println(s"[bench] cdc throughput FAILED: $e"); Seq.empty }
    val cdcJson =
      if (cdc.isEmpty) ""
      else cdc.map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", v)
      }.mkString(",\"cdc\":{", ",", "}")
    // Locale.ROOT: f"" uses the default locale — a comma decimal
    // separator would make the JSON line unparseable
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def entry(kv: (String, Double)): String = "\"" + kv._1 + "\":" + ms(kv._2)
    val qsFull = results.map(entry).mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","anchor_sec":${ms(anchorSec)},"anchor_spread":${ms(anchorSpread)},"degraded":$degraded,"total_per_anchor":${ms(total / anchorSec)},"queries":$qsFull$cdcJson,"sf":"$sfDir","runs":$runs}"""
    // Full per-query map goes to a file + stderr. The LAST stdout line
    // must be a COMPLETE JSON object inside the driver's bounded log
    // tail (2000 chars, minus sbt's trailing "[success] Total time"
    // line) — the full line with 80+ queries is ~3 KB and gets its
    // FRONT truncated off, which is exactly why BENCH_r01..r04 all
    // recorded parsed:null. So the final line carries the total plus
    // only as many per-query entries as fit a fixed budget,
    // slowest-first (the diagnostic ones), and points at the file for
    // the rest.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    System.err.println(full)
    System.err.flush()
    val bySlow = results.filter(_._2 >= 0).sortBy { case (k, v) => (-v, k) }
    // the cdc block comes out of the queries budget so the final line
    // stays inside the driver's 2000-char tail — sized off the actual
    // block (it grew to ~800 chars with the r10 state-growth metrics)
    val budget = math.max(300, 1295 - cdcJson.length) // −30: anchor_sec, −30: total_per_anchor, −25: anchor_spread, −20: degraded
    val kept = new StringBuilder
    var nKept = 0
    // stop at the FIRST entry that doesn't fit, so the kept set is a
    // true prefix of the slowest-first ranking (a slow query with a
    // long name must not be dropped in favor of faster short names)
    val it = bySlow.iterator
    var full_ = false
    while (it.hasNext && !full_) {
      val e = entry(it.next())
      if (kept.length + e.length + 1 <= budget) {
        if (nKept > 0) kept.append(',')
        kept.append(e); nKept += 1
      } else full_ = true
    }
    val truncated = nKept < results.length
    // total_per_anchor = total / anchor_sec: the box-drift-normalized
    // read (r12 verdict ask #4 — the anchor is useless if nothing
    // consumes it). Compare THIS across rounds; raw totals only within
    // a round.
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","anchor_sec":${ms(anchorSec)},""" +
        s""""anchor_spread":${ms(anchorSpread)},"degraded":$degraded,""" +
        s""""total_per_anchor":${ms(total / anchorSec)},""" +
        s""""queries":{${kept.result()}},""" +
        s""""queries_truncated":$truncated,"nqueries":${results.length},""" +
        s""""queries_order":"slowest_first","queries_file":"BENCH_LOCAL.json"$cdcJson,""" +
        s""""sf":"$sfDir","runs":$runs}"""
    println(line)
    spark.stop()
  }
}
