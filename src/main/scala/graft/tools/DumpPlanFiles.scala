package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence dumper: writes
  * `plans/<round>/<query>_<tag>.txt` with `explain("formatted")` output
  * (the executed plan after one action finalizes AQE) for each named
  * query. Usage:
  *
  *   sbt "runMain graft.tools.DumpPlanFiles r18 before q1,q2,..."
  *
  * sf0.001 — plans are shape-identical at every SF; only statistics
  * change (same convention as [[DumpPlans]]).
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpPlanFiles <round> <tag> <q1,q2,...>")
    val (round, tag, names) = (args(0), args(1), args(2).split(",").toSeq)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val dir = Paths.get(s"/root/repo/plans/$round")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE so the dumped plan is the executed one
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(dir.resolve(s"${name}_$tag.txt"), formatted)
      println(s"[plans] wrote plans/$round/${name}_$tag.txt")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
