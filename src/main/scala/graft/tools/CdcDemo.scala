package graft.tools

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.streaming.{CdcPipeline, ChangeEvent, KeyedParquetStore}

/** Runnable end-to-end CDC mirror demo (the reference's quickstart
  * flow: seed → mirror → workload → lag check). Prints the target
  * state and the lag/sync report. */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("cdc_demo").toString
    val store = new KeyedParquetStore(root, nBuckets = 8)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("first_name", StringType),
      StructField("last_name", StringType),
      StructField("email", StringType)))

    val seed = Seq(
      (1001L, "Sally", "Thomas", "sally.thomas@acme.com"),
      (1002L, "George", "Bailey", "gbailey@foobar.com"),
      (1003L, "Edward", "Walker", "ed@walker.com"),
      (1004L, "Anne", "Kretchmar", "annek@noanswer.org")
    ).toDF("id", "first_name", "last_name", "email")

    CdcPipeline.snapshot(spark, store, Map("customers" -> seed), Map("customers" -> "id"))
    println(s"[demo] snapshot done: ${store.read(spark, "customers").count()} rows")

    val stream = MemoryStream[ChangeEvent](spark)
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000)
    stream.addData(
      ChangeEvent(1, t(1), "I", "customers", 1005,
        """{"id":1005,"first_name":"New","last_name":"Person","email":"n@p.com"}"""),
      ChangeEvent(2, t(2), "U", "customers", 1001,
        """{"id":1001,"first_name":"Sally","last_name":"Updated","email":"s@u.com"}"""),
      ChangeEvent(3, t(3), "D", "customers", 1002, null))

    val q = CdcPipeline.start(stream.toDF(), store,
      Map("customers" -> schema), Map("customers" -> "id"),
      mirrorName = "demo_mirror",
      checkpointDir = Files.createTempDirectory("cdc_demo_ckpt").toString)
    q.processAllAvailable()
    q.stop()

    println("[demo] target state after I/U/D stream:")
    store.read(spark, "customers").orderBy("id").show(false)

    val expected = Seq(
      (1001L, "Sally", "Updated", "s@u.com"),
      (1003L, "Edward", "Walker", "ed@walker.com"),
      (1004L, "Anne", "Kretchmar", "annek@noanswer.org"),
      (1005L, "New", "Person", "n@p.com")
    ).toDF("id", "first_name", "last_name", "email")
    println("[demo] lag report vs expected source:")
    CdcPipeline.lagReport(spark, store, Map("customers" -> expected)).show(false)
    spark.stop()
  }
}
