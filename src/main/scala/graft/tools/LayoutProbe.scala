package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev tool: prove the SCAN-PARALLELISM claim on a splittable layout
  * (r9 verdict ask #3). SCALE.md records that every driver-shipped
  * sf0.1 table is ONE parquet file with ONE row group — unsplittable,
  * so every scan stage is a single task regardless of cores, and the
  * engine's parallelism cannot show on the scan-bound tail. The claim
  * "the engine parallelizes, the data doesn't" stayed an assertion;
  * this converts it into a measurement:
  *
  *  1. build a `factor`× copy of the tables behind s1/p2/a3/t1
  *     (orders, customer, documents — ids offset per copy);
  *  2. write IDENTICAL data twice — `mono/` as one file with a 2 GiB
  *     row-group target (reproducing the driver layout's degenerate
  *     shape at a size where it hurts) and `split/` as 32 files;
  *  3. run each query on both layouts, recording wall seconds, the
  *     scan's split count, and the number of NON-EMPTY splits (a
  *     single-row-group file can byte-range "split" into N tasks, but
  *     every row lands in the one split holding the row group — the
  *     others scan nothing).
  *
  * Output: one JSON line per (query, layout) + a summary. → SCALE.md.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_layout"
    val factor = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // lineitem: offset the PRIMARY id only (l_orderkey) — part/supp
    // keys stay in-range so join fan-out per copy is preserved; the
    // mono-vs-split comparison only needs the two layouts to hold
    // IDENTICAL rows, not to mirror sf0.1 semantics
    val tables = Seq("orders", "customer", "documents", "lineitem")
    val mono = s"$out/mono"
    val split = s"$out/split"

    tables.foreach { t =>
      if (!new java.io.File(s"$split/$t.parquet").exists()) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val idCol = t match {
          case "orders" => "o_orderkey"
          case "customer" => "c_custkey"
          case "lineitem" => "l_orderkey"
          case _ => "doc_id"
        }
        val span = base.agg(max(idCol)).collect().head.getLong(0) + 1
        val big = (0 until factor)
          .map { k =>
            val c = base.withColumn(idCol, col(idCol) + lit(k * span))
            // documents: suffix copy-k tokens like ScaleProbe does, so
            // the near-dup pair population stays LINEAR in factor — a
            // verbatim copy matches every shingle across all copies
            // (pairs ×factor²) and the c/d rows would measure CC on a
            // quadratically denser graph, not scan parallelism
            // (observed: c3 at 95 s/run before this fix)
            if (t == "documents" && k > 0)
              c.withColumn("text",
                expr(s"array_join(transform(split(text, ' '), x -> concat(x, '_c$k')), ' ')"))
                .withColumn("n_chars", length(col("text")).cast("long"))
            else c
          }
          .reduce(_ unionByName _)
        // one file, one (huge) row group — the unsplittable shape
        big.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", Int.MaxValue.toString)
          .parquet(s"$mono/$t.parquet")
        // same rows, 32 files — the layout a real ingest writes
        big.repartition(32).write.mode("overwrite")
          .parquet(s"$split/$t.parquet")
        System.err.println(s"[layout] built ${factor}x $t (mono + split)")
      }
    }

    // tasks actually executed per query, via listener (completed tasks
    // across all stages — scan + shuffle; the scan delta dominates)
    val taskCount = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskCount.incrementAndGet()
    })

    def scanShape(dir: String, t: String): (Int, Int) = {
      val sizes = spark.read.parquet(s"$dir/$t.parquet")
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      (sizes.length, sizes.count(_ > 0))
    }

    def time(name: String, dir: String): (Double, Long) = {
      def once(): (Double, Long) = {
        // drain listener events from previous work before sampling
        Thread.sleep(300)
        taskCount.set(0L)
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let the last stage's task-end events land
          (dt, taskCount.get())
        } finally {
          // checkpoint-heavy queries (CC family) must not leak blocks
          // into the next run's heap — same sweep Bench/ScaleProbe use
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          spark.sharedState.cacheManager.clearCache()
        }
      }
      System.gc()
      once() // warm
      Seq(once(), once()).minBy(_._1)
    }

    // the top scan-bound bench queries (r10 verdict ask #7) beside the
    // original 4 microbenchmarks: the c/d document family (shingle +
    // CC pipelines whose first stage is the corpus scan), the lineitem
    // graph/pricing pair, all reading ONLY tables built above
    val queries = Seq(
      "s1_scan_project" -> "orders",
      "p2_filter_eq" -> "customer",
      "a3_group_count" -> "orders",
      "t1_token_count" -> "documents",
      "c3_leakage_safe_split" -> "documents",
      "c4_contamination_clusters" -> "documents",
      "d11_prefix_filter" -> "documents",
      "d8_cluster_reps" -> "documents",
      "g3_copurchase_recs" -> "lineitem",
      "x5_pricing_summary" -> "lineitem")

    // dev loop: SPARK_GRAFT_LAYOUT_ONLY=q1,q2 probes a subset
    val only = sys.env.get("SPARK_GRAFT_LAYOUT_ONLY").map(_.split(",").toSet)
    val rows = queries.filter(q => only.forall(_.contains(q._1))).map { case (q, t) =>
      val (monoSplits, monoNonEmpty) = scanShape(mono, t)
      val (splSplits, splNonEmpty) = scanShape(split, t)
      val (mSec, mTasks) = time(q, mono)
      val (sSec, sTasks) = time(q, split)
      println(
        f"""{"query":"$q","table":"$t","mono_s":$mSec%.3f,"split_s":$sSec%.3f,"speedup":${mSec / sSec}%.2f,""" +
          f""""mono_scan_splits":$monoSplits,"mono_nonempty":$monoNonEmpty,""" +
          f""""split_scan_splits":$splSplits,"split_nonempty":$splNonEmpty,""" +
          f""""mono_tasks":$mTasks,"split_tasks":$sTasks}""")
      (q, mSec, sSec)
    }
    val best = rows.maxBy(r => r._2 / r._3)
    println(f"""{"summary":"layout_probe","factor":$factor,"best_query":"${best._1}","best_speedup":${best._2 / best._3}%.2f}""")
    spark.stop()
  }
}
