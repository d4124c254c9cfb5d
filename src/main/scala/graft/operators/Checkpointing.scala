package graft.operators

import org.apache.spark.sql.DataFrame

/** Iteration-pin discipline for the iterative operators (g1 PageRank,
  * g4 BFS, d5/s8 connected components, the shared co-purchase edge
  * build): each generation is CHECKPOINTED so lineage stays shallow
  * and planning stays sane ([[org.apache.spark.sql.graftbridge.Bridge
  * .withExactStats]]).
  *
  * The default pin is `localCheckpoint(eager = true)` — executor-
  * MEMORY-backed, zero disk I/O, the right call on a healthy cluster
  * and in local mode. Its trade is fault tolerance: localCheckpoint
  * TRUNCATES lineage, so losing an executor mid-iteration loses blocks
  * that can no longer be recomputed and the job dies (r14 verdict's
  * g4 note). For long iterative runs on preemptible/spot executors,
  * set the session conf
  *
  *   `graft.iterativeCheckpoint = reliable`
  *
  * (plus `SparkContext.setCheckpointDir` to a fault-tolerant FS) and
  * every iteration pin becomes a RELIABLE `checkpoint()` — materialized
  * to the checkpoint directory, recoverable across executor loss, at
  * the cost of one write+read per generation. Same plan shape either
  * way (both produce a `LogicalRDD`), so stats pinning and the
  * generation-free discipline compose unchanged; results are
  * bit-identical (`ReliableCheckpointSpec`). */
object Checkpointing {

  /** Session-conf key: "local" (default) or "reliable". */
  val ModeKey = "graft.iterativeCheckpoint"

  /** Pin a generation frame under the session's checkpoint mode. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ModeKey, "local") == "reliable") {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ModeKey=reliable requires SparkContext.setCheckpointDir " +
          "(a fault-tolerant location every executor can reach)")
      df.checkpoint() // eager + reliable
    } else df.localCheckpoint(true)
  }
}
