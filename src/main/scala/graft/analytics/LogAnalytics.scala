package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-replay analytics — the monitoring suite's section 10
  * (monitoring.ps1:1032–1156): parse stress-test / resource logs back
  * into DataFrames and compute the batch/latency/trend reports the
  * reference derives client-side in PowerShell.
  *
  * Sources are line-oriented text (`spark.read.text` + regexp_extract,
  * SURVEY.md S8/P4); every downstream report is a plain DataFrame
  * aggregation, so the same analytics run over a 100 TB log lake by
  * pointing the glob at it.
  */
object LogAnalytics {

  /** Read raw log lines (glob ok), tagged with their file. */
  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumn("file", input_file_name())

  /** File-listing DataFrame over a directory or glob (S9/W2: glob +
    * mtime sort, monitoring.ps1:61–69). A plain directory path lists
    * its children. */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(new org.apache.hadoop.fs.Path(dir))
    (if (st == null) Array.empty[org.apache.hadoop.fs.FileStatus] else st)
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath) else Array(s))
      .filter(_.isFile)
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
      .toSeq
      .toDF("path", "bytes", "mtime_ms")
  }

  /** Latest-file selection (monitoring.ps1:61–65,133–134): newest by
    * mtime, path as tiebreak. */
  def latestFile(spark: SparkSession, dir: String): Option[String] =
    listFiles(spark, dir)
      .orderBy(desc("mtime_ms"), desc("path"))
      .limit(1).collect().headOption.map(_.getString(0))

  /** Parse stress-log batch lines
    * `[#####] INSERT-BATCH-<n> rows=<r> latency_ms=<l>`
    * (format written by gen.Workload; shape from insert.ps1:173–178). */
  def parseBatches(log: DataFrame): DataFrame =
    log
      // ANSI mode (Spark 4 default) rejects cast('') — select matching
      // lines before extracting
      .filter(col("value").rlike("INSERT-BATCH-\\d+ rows=\\d+ latency_ms=\\d+"))
      .select(
        regexp_extract(col("value"), "INSERT-BATCH-(\\d+)", 1).cast("int").as("batch"),
        regexp_extract(col("value"), "rows=(\\d+)", 1).cast("long").as("rows"),
        regexp_extract(col("value"), "latency_ms=(\\d+)", 1).cast("long").as("latency_ms"))

  /** Parse docker-stats-style resource lines
    * `<container> <cpu>% <mem><unit>iB` (monitoring.ps1:1085), with
    * the unit ladder normalised to MiB (monitoring.ps1:1093–1097). */
  def parseResources(log: DataFrame): DataFrame =
    log
      .withColumn("m", regexp_extract(col("value"),
        "^(\\S+)\\s+(\\d+\\.\\d+)%\\s+(\\d+\\.\\d+)(\\w)iB", 0))
      .filter(col("m") =!= "")
      .select(
        regexp_extract(col("value"), "^(\\S+)", 1).as("container"),
        regexp_extract(col("value"), "\\s(\\d+\\.\\d+)%", 1).cast("double").as("cpu_pct"),
        regexp_extract(col("value"), "%\\s+(\\d+\\.\\d+)", 1).cast("double").as("mem"),
        regexp_extract(col("value"), "(\\w)iB", 1).as("unit"))
      .withColumn("mem_mib",
        when(col("unit") === "T", col("mem") * 1024 * 1024)
          .when(col("unit") === "G", col("mem") * 1024)
          .when(col("unit") === "M", col("mem"))
          .when(col("unit") === "K", col("mem") / 1024)
          .otherwise(col("mem") / (1024 * 1024))) // bare B
      .drop("mem", "unit")

  /** Batch latency stats — insert.ps1:321–323/361–363. */
  def latencyStats(batches: DataFrame): DataFrame =
    batches.agg(
      count(lit(1)).as("n_batches"),
      sum("rows").as("total_rows"),
      min("latency_ms").as("min_ms"),
      round(avg("latency_ms"), 2).as("avg_ms"),
      max("latency_ms").as("max_ms"))

  /** Peak / lowest batch by a metric — monitoring.ps1:1121–1122. */
  def topBatches(batches: DataFrame, metric: String, k: Int = 1): DataFrame =
    batches.orderBy(col(metric).desc, col("batch").asc).limit(k)

  /** First-third vs last-third trend — monitoring.ps1:1133–1142.
    * Input is the (small) per-batch metrics table, but the tiling goes
    * through the same scale-safe [[graft.operators.CoreQueries.globalNtile]]
    * as w3/w4 — no unpartitioned window anywhere in the library. */
  def trend(batches: DataFrame, metric: String): DataFrame = {
    val tiled = graft.operators.CoreQueries.globalNtile(batches, "batch", 3)
    tiled.agg(
        avg(when(col("tile") === 1, col(metric))).as("early_avg"),
        avg(when(col("tile") === 3, col(metric))).as("late_avg"))
      .select(
        round(col("early_avg"), 2).as("early_avg"),
        round(col("late_avg"), 2).as("late_avg"),
        round(col("late_avg") - col("early_avg"), 2).as("delta"))
  }

  /** Per-container resource rollup (avg CPU, total mem) —
    * monitoring.ps1:1100–1112. */
  def resourceRollup(res: DataFrame): DataFrame =
    res.groupBy("container")
      .agg(
        round(avg("cpu_pct"), 2).as("avg_cpu_pct"),
        round(sum("mem_mib"), 2).as("total_mem_mib"),
        count(lit(1)).as("n_samples"))
      .orderBy("container")

  /** Summary-line extraction (Successful Operations / Throughput) —
    * monitoring.ps1:1036–1051. */
  def summary(log: DataFrame): DataFrame = {
    def extracted(pattern: String): org.apache.spark.sql.Column = {
      val e = regexp_extract(col("value"), pattern, 1)
      when(e =!= "", e)
    }
    log.agg(
      max(extracted("Successful Operations: (\\d+)").cast("long")).as("successful_ops"),
      max(extracted("Throughput: ([0-9.]+) operations/second").cast("double"))
        .as("throughput_ops_s"))
  }
}
