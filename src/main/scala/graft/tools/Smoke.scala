package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for schema/plan inspection. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
