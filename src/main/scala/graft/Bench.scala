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
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
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
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          spark.sharedState.cacheManager.clearCache()
        }
      }
      val med =
        try {
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
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Locale.ROOT: f"" uses the default locale — a comma decimal
    // separator would make the JSON line unparseable
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}"""
    // emit on BOTH streams and to a file: sbt at `-error` level swallows
    // the program's stdout entirely, while at default level stdout passes
    // through unprefixed — cover both so a bounded log tail always parses
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    System.err.println(line)
    System.err.flush()
    println(line)
    spark.stop()
  }
}
