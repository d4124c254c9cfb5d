package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the embedding column (`Array[Float]`, 64-d):
  * brute-force cosine top-k as the exactness baseline, an LSH
  * (random-hyperplane) bucketed variant as the scale path, and
  * cosine near-dup pairs.
  *
  * Cross-engine determinism: vector components are quantized to
  * integer millionths (`round(v * 1e6)` — float32 inputs are exact in
  * double, so the quantization is identical in Spark and DuckDB), and
  * dot products / norms are computed in exact BIGINT arithmetic
  * (64 · (1e6·500)² ≈ 2^61 max — fits). Cosine is then one double
  * division — deterministic regardless of aggregation order, at any
  * parallelism.
  *
  * Scale notes: the brute-force variant is an explode + equi-join on
  * the component index — at 100 TB you never run it globally; the LSH
  * variant buckets by hyperplane sign pattern first, so the quadratic
  * rerank only happens inside buckets (the standard IVF/LSH shape).
  */
object SimilarityQueries {

  /** (vec_id, idx, q) — quantized components, exploded. */
  private def comps(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .select(col("vec_id"), col("idx"),
        round(col("v").cast("double") * 1000000).cast("long").as("q"))

  /** (vec_id, norm) — exact integer self-dot, then one sqrt. */
  private def norms(c: DataFrame): DataFrame =
    c.groupBy("vec_id").agg(sqrt(sum(col("q") * col("q"))).as("norm"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-k: queries = vec_id < 5, k = 5
    "s1_cosine_topk" -> { (s, d) =>
      val c = comps(s, d)
      val n = norms(c)
      val qc = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("idx"), col("q").as("qv"))
      val dots = qc.join(c.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("vid"), col("idx"), col("q").as("vv")), Seq("idx"))
        .groupBy("qid", "vid").agg(sum(col("qv") * col("vv")).as("dot"))
      val cos = dots
        .join(n.select(col("vec_id").as("qid"), col("norm").as("qn")), Seq("qid"))
        .join(n.select(col("vec_id").as("vid"), col("norm").as("vn")), Seq("vid"))
        .withColumn("cos_raw", col("dot") / (col("qn") * col("vn")))
      cos
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid", "rank")
    },

    // LSH-bucketed ANN: 6 deterministic pseudo-random hyperplanes →
    // 64-bucket space; candidates share a bucket; rerank inside.
    // Hyperplane j component at dim d: ((j*64+d)*2654435761) % 97 - 48
    // (Knuth multiplicative hash → small signed weight).
    "s2_lsh_ann" -> { (s, d) =>
      val c = comps(s, d)
      val planes = s.range(6).select(col("id").as("j"))
        .crossJoin(s.range(64).select(col("id").as("pd")))
        .withColumn("w", (col("j") * 64 + col("pd")) * 2654435761L % 97 - 48)
      val proj = c.join(planes, col("idx") === col("pd"))
        .groupBy("vec_id", "j").agg(sum(col("q") * col("w")).as("proj"))
      val buckets = proj.groupBy("vec_id")
        .agg(sum(when(col("proj") > 0,
          expr("CAST(power(2, j) AS LONG)")).otherwise(0L)).as("bucket"))
      val n = norms(c)
      val pairs = buckets.as("a").join(buckets.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vid"), col("a.bucket"))
      val dots = pairs
        .join(c.select(col("vec_id").as("qid"), col("idx"), col("q").as("qv")), Seq("qid"))
        .join(c.select(col("vec_id").as("vid"), col("idx"), col("q").as("vv")), Seq("vid", "idx"))
        .groupBy("qid", "vid", "bucket").agg(sum(col("qv") * col("vv")).as("dot"))
      dots
        .join(n.select(col("vec_id").as("qid"), col("norm").as("qn")), Seq("qid"))
        .join(n.select(col("vec_id").as("vid"), col("norm").as("vn")), Seq("vid"))
        .withColumn("cos_raw", col("dot") / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") === 1)
        .select(col("qid"), col("bucket"), col("vid"),
          round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid")
    },

    // embedding cosine near-dup pairs (threshold 0.45 (corpus max pair cosine is ~0.51 — no planted dups; threshold tuned to yield a bounded, non-empty result))
    "s3_cosine_neardup" -> { (s, d) =>
      val c = comps(s, d)
      val n = norms(c)
      val dots = c.select(col("vec_id").as("da"), col("idx"), col("q").as("qa"))
        .join(c.select(col("vec_id").as("db"), col("idx"), col("q").as("qb")), Seq("idx"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(sum(col("qa") * col("qb")).as("dot"))
      dots
        .join(n.select(col("vec_id").as("da"), col("norm").as("na")), Seq("da"))
        .join(n.select(col("vec_id").as("db"), col("norm").as("nb")), Seq("db"))
        .withColumn("cos_raw", col("dot") / (col("na") * col("nb")))
        .filter(col("cos_raw") >= 0.45)
        .select(col("da"), col("db"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("da", "db")
    }
  )

  private val compsSql =
    """c AS (
         SELECT vec_id, idx - 1 AS idx,
           CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS q
         FROM (SELECT vec_id, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS idx
               FROM embeddings)),
       n AS (SELECT vec_id, sqrt(SUM(q * q)) AS norm FROM c GROUP BY 1)"""

  def oracles: Map[String, String] = Map(
    "s1_cosine_topk" ->
      s"""WITH $compsSql,
          dots AS (
            SELECT qc.vec_id AS qid, vc.vec_id AS vid, SUM(qc.q * vc.q) AS dot
            FROM c qc JOIN c vc ON qc.idx = vc.idx
            WHERE qc.vec_id < 5 AND vc.vec_id >= 5
            GROUP BY 1, 2),
          cos AS (
            SELECT qid, vid, dot / (qn.norm * vn.norm) AS cos_raw
            FROM dots JOIN n qn ON qid = qn.vec_id JOIN n vn ON vid = vn.vec_id)
          SELECT qid, rank, vid, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT qid, vid, cos_raw,
              row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rank
            FROM cos)
          WHERE rank <= 5 ORDER BY qid, rank""",
    "s2_lsh_ann" ->
      s"""WITH $compsSql,
          planes AS (
            SELECT j, pd, (j * 64 + pd) * 2654435761 % 97 - 48 AS w
            FROM range(6) a(j) CROSS JOIN range(64) b(pd)),
          proj AS (
            SELECT vec_id, j, SUM(q * w) AS proj
            FROM c JOIN planes ON c.idx = planes.pd GROUP BY 1, 2),
          buckets AS (
            SELECT vec_id,
              SUM(CASE WHEN proj > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS bucket
            FROM proj GROUP BY 1),
          pairs AS (
            SELECT a.vec_id AS qid, b.vec_id AS vid, a.bucket
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
          dots AS (
            SELECT qid, vid, bucket, SUM(qc.q * vc.q) AS dot
            FROM pairs JOIN c qc ON qid = qc.vec_id
            JOIN c vc ON vid = vc.vec_id AND qc.idx = vc.idx
            GROUP BY 1, 2, 3),
          cos AS (
            SELECT qid, vid, bucket, dot / (qn.norm * vn.norm) AS cos_raw
            FROM dots JOIN n qn ON qid = qn.vec_id JOIN n vn ON vid = vn.vec_id)
          SELECT qid, bucket, vid, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT qid, vid, bucket, cos_raw,
              row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rank
            FROM cos)
          WHERE rank = 1 ORDER BY qid""",
    "s3_cosine_neardup" ->
      s"""WITH $compsSql,
          dots AS (
            SELECT a.vec_id AS da, b.vec_id AS db, SUM(a.q * b.q) AS dot
            FROM c a JOIN c b ON a.idx = b.idx AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
          SELECT da, db, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT da, db, dot / (na.norm * nb.norm) AS cos_raw
            FROM dots JOIN n na ON da = na.vec_id JOIN n nb ON db = nb.vec_id)
          WHERE cos_raw >= 0.45 ORDER BY da, db"""
  )
}
