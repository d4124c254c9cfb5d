package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: BPE training wall-time on the real corpus. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val t0 = System.nanoTime()
    val (merges, vocab) = graft.operators.Bpe.trainOnCorpus(docs, "text", rounds = 10)
    val nv = vocab.count()
    println(f"[bpe] 10 rounds in ${(System.nanoTime()-t0)/1e9}%.1f s; " +
      s"first=${merges.head}, last=${merges.last}, out-vocab=$nv")
    spark.stop()
  }
}
