package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale joins.
  *
  * AQE's skew-join splitting (on by default) handles most cases at
  * runtime; explicit salting is for the pathological ones AQE can't
  * fix — a single hot key whose matching build-side row must be
  * replicated (e.g. the null-key / default-tenant / "unknown" row that
  * holds half a fact table).
  */
object Skew {

  /** Salted equi-join of a skewed `facts` table against a (small-ish)
    * `dim` table on `key`.
    *
    * Mechanics: each fact row gets a DETERMINISTIC salt in
    * [0, saltFactor) — `pmod(xxhash64(row), saltFactor)` over every
    * fact column; the dim side is exploded ×saltFactor so every
    * (key, salt) bucket finds its match. The hot key's rows spread
    * over `saltFactor` shuffle partitions instead of one. Result is
    * row-identical to `facts.join(dim, key)` — only the physical
    * distribution changes.
    *
    * Why not `rand()`: a non-deterministic salt + a shuffle-fetch
    * failure is the classic silent row-duplication/loss trap — Spark
    * recomputes the lost map task, the recomputed rows draw DIFFERENT
    * salts, and rows double or vanish across the join. Hashing the
    * row content keeps every retry bit-identical. The one shape this
    * doesn't spread is many byte-identical copies of one literal row
    * (they share a salt) — that degenerate case wants a
    * `monotonically_increasing_id`-derived salt and a conscious
    * trade-off, not a silent default. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(facts.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(explodedDim, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Top-N heavy-hitter keys with their frequency share — the
    * diagnostic that decides whether salting is warranted.
    *
    * Single scan of the input: the grand total is a window sum over the
    * already-aggregated per-key counts (cardinality = #distinct keys),
    * not a second `count()` pass over the raw table. The unpartitioned
    * window runs on that aggregate only; at extreme key cardinality
    * you'd profile a sample, not the full keyspace. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share_pct",
        round(lit(100.0) * col("n") / sum("n").over(Window.partitionBy()), 2))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
