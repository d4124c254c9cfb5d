package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExprs.{dot_long, hyperplane_bucket}
import graft.sources.Tables

/** Similarity search over the embedding column (`Array[Float]`, 64-d):
  * brute-force cosine top-k as the exactness baseline, an LSH
  * (random-hyperplane) bucketed variant as the scale path, and
  * cosine near-dup pairs.
  *
  * Cross-engine determinism: vector components are quantized to
  * integer millionths (`round(v * 1e6)` — float32 inputs are exact in
  * double, so the quantization is identical in Spark and DuckDB), and
  * dot products / norms are computed in exact BIGINT arithmetic.
  * Overflow bound: 64-term sums of q² stay inside int64 for
  * components |v| < ~120 (64·(1.2e8)² ≈ 9.2e18); this corpus is
  * unit-scale (|v| ≤ 1, sums ≤ 6.4e13). Larger-magnitude embeddings
  * would need DECIMAL(38,0) accumulators like x5's. Cosine is one
  * double division — deterministic regardless of aggregation order,
  * at any parallelism.
  *
  * Scale notes: the brute-force variant is an explode + equi-join on
  * the component index — at 100 TB you never run it globally; the LSH
  * variant buckets by hyperplane sign pattern first, so the quadratic
  * rerank only happens inside buckets (the standard IVF/LSH shape).
  */
object SimilarityQueries {

  /** (vec_id, qv, norm) — quantized component ARRAY + norm, one row
    * per vector. All downstream dot products are the compiled
    * [[graft.functions.DotLong]] expression — per-row array math with
    * no explode and no 64× row blow-up through the shuffle (Spark's
    * higher-order `aggregate`/`zip_with` evaluate their lambdas
    * interpreted — far too slow per candidate pair). Integer adds are
    * associative, so results equal the relational (exploded)
    * formulation exactly. The quantization transform stays a built-in
    * `transform` (runs once per vector, not per pair). */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("qv"))
      .withColumn("norm", sqrt(dot_long(col("qv"), col("qv")).cast("double")))

  /** Exact integer dot product of two quantized arrays. */
  private def dotCol = dot_long(col("va"), col("vb"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-k: queries = vec_id < 5, k = 5. The
    // query side is tiny → broadcast; each pair's dot is per-row
    // array math (no shuffle of exploded components).
    "s1_cosine_topk" -> { (s, d) =>
      val v = vecs(s, d)
      val q = v.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("qv").as("va"), col("norm").as("qn"))
      val t = v.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("vid"), col("qv").as("vb"), col("norm").as("vn"))
      t.join(broadcast(q))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid", "rank")
    },

    // ── s20: HYBRID retrieval — the production RAG shape: a lexical
    // BM25 rank list and a semantic cosine rank list, fused by
    // reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009: score =
    // Σ_arms 1/(60+rank)) — no score calibration between arms, only
    // ranks, which is WHY RRF is the default fusion in production
    // retrieval stacks. Arms follow the engine's existing disciplines:
    // the lexical arm is t17's integer-exact BM25 (rational idf
    // surrogate, ×10⁴ floor-div — bit-identical across engines); the
    // semantic arm is s1's compiled-dot cosine against anchor vec 0.
    // Each arm reduces to its top-50 via TakeOrdered (never a global
    // sort); the rank window then runs over that bounded 50-row frame
    // (a SinglePartition exchange over ≤50 rows — deliberate, the one
    // place it is the right call). Fusion contributions are
    // 10⁹ div (60+rank): pure integer division, exact in both
    // engines; an id missing from one arm contributes 0 there (-1
    // sentinel in the output). At 100 TB each arm's candidate
    // generation is the already-scaled machinery (inverted term
    // pruning for BM25, IVF routing for cosine) — fusion itself only
    // ever touches 2×50 rows.
    "s20_hybrid_rrf" -> { (s, d) =>
      import graft.functions.HashExprs.tokenize
      val qterms = Seq("spark", "join", "vector")
      // lexical arm (t17's shape: one tokenize pass, tiny pinned frame)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), tokenize(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
          filter(col("toks"), t => t.isin(qterms: _*)).as("qtoks"))
        .localCheckpoint(true)
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_toks"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val bm25 = tf.join(broadcast(dfreq), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("c", expr(
          "((2*n_docs - 2*df + 1) * 22 * tf * t_toks * 10000) div " +
            "((2*df + 1) * (10*t_toks*tf + 3*t_toks + 9*n_docs*dl))"))
        .groupBy("doc_id").agg(sum("c").as("score10k"))
        .orderBy(col("score10k").desc, col("doc_id").asc)
        .limit(50)
      val lex = bm25.withColumn("lex_rank", row_number().over(
          Window.orderBy(col("score10k").desc, col("doc_id").asc)))
        .select(col("doc_id").as("id"), col("lex_rank"))
      // semantic arm (s1's shape: 1-row anchor broadcast, compiled dot)
      val v = vecs(s, d)
      val anchor = v.filter(col("vec_id") === 0)
        .select(col("qv").as("va"), col("norm").as("qn"))
      val sem = v.filter(col("vec_id") > 0)
        .select(col("vec_id").as("id"), col("qv").as("vb"), col("norm").as("vn"))
        .crossJoin(broadcast(anchor))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .orderBy(col("cos_raw").desc, col("id").asc)
        .limit(50)
        .withColumn("sem_rank", row_number().over(
          Window.orderBy(col("cos_raw").desc, col("id").asc)))
        .select(col("id"), col("sem_rank"))
      // fusion as UNION + per-id max-rank aggregate, not a join: a
      // FULL OUTER join cannot broadcast in Spark (it planned as a
      // SortMergeJoin even at 2×50 rows), while the union spelling is
      // one ≤100-row hash aggregate and generalizes to k arms with
      // zero joins — the shape a production fusion layer wants anyway
      lex.select(col("id"), col("lex_rank"), lit(-1).as("sem_rank"))
        .unionByName(sem.select(col("id"), lit(-1).as("lex_rank"),
          col("sem_rank")))
        .groupBy("id")
        .agg(max("lex_rank").as("lex_rank"), max("sem_rank").as("sem_rank"))
        .withColumn("rrf1e9",
          when(col("lex_rank") > 0, expr("1000000000 div (60 + lex_rank)"))
            .otherwise(lit(0L)) +
            when(col("sem_rank") > 0, expr("1000000000 div (60 + sem_rank)"))
              .otherwise(lit(0L)))
        .orderBy(col("rrf1e9").desc, col("id").asc)
        .limit(20)
    },

    // ── s21: CORESET SELECTION — greedy k-center (Gonzalez's
    // farthest-first traversal, the classic 2-approximation to
    // optimal k-center cover): seed = smallest vec_id, then k−1 times
    // the point FARTHEST from everything chosen so far (max of
    // min-distance). The curation use: a diversity-maximizing subset
    // for expensive downstream passes (human eval, reranker seeds)
    // where similarity-blind sampling wastes budget on near-dups.
    // Determinism: distances are exact int64 squared-L2 on micro-unit
    // quantized components, so every argmax and tie-break (largest
    // min-dist, then smallest vec_id) replays bit-equal in DuckDB's
    // unrolled greedy. Scale: k linear passes over N rows, each a
    // codegen'd per-row LEAST over ≤k literal-center dot products
    // followed by a TakeOrdered(1) reduction — no join, no shuffle
    // beyond the reduction; driver state is k×64 longs (the centers
    // ride the plan as array literals, never a broadcast table). The
    // closing assignment pass (cluster sizes) is the same per-row
    // expression + a k-group hash aggregate.
    "s21_coreset" -> { (s, d) =>
      val k = 5
      val quant = Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("qv"))
        .withColumn("n2", dot_long(col("qv"), col("qv")))
        .localCheckpoint(true) // k+2 passes reuse it (persist at scale)
      // exact |x − c|² = x·x − 2x·c + c·c with c a plan literal
      def d2To(center: IndexedSeq[Long]): Column =
        col("n2") - lit(2L) * dot_long(col("qv"), typedLit(center)) +
          lit(center.map(x => x * x).sum)
      def minDist(cs: Seq[Column]): Column =
        if (cs.sizeIs == 1) cs.head else least(cs: _*)
      val seed = quant.orderBy(asc("vec_id")).limit(1)
        .select(col("vec_id"), col("qv")).head()
      var centers = Vector(
        (1, seed.getLong(0), 0L, seed.getSeq[Long](1).toIndexedSeq))
      for (step <- 2 to k) {
        val nxt = quant
          .filter(!col("vec_id").isin(centers.map(_._2): _*))
          .select(col("vec_id"),
            minDist(centers.map(c => d2To(c._4))).as("md"), col("qv"))
          .orderBy(col("md").desc, col("vec_id").asc).limit(1).head()
        centers = centers :+ ((step, nxt.getLong(0), nxt.getLong(1),
          nxt.getSeq[Long](2).toIndexedSeq))
      }
      // nearest-center assignment; ties break to the earlier center —
      // LEAST over (dist, step) structs is the codegen'd argmin
      val best = minDist(centers.map(c =>
        struct(d2To(c._4).as("d"), lit(c._1).as("st"))))
      val counts = quant.select(best.getField("st").as("step"))
        .groupBy("step").agg(count(lit(1)).as("n_assigned"))
      import s.implicits._
      val cent = centers.map(c => (c._1, c._2, c._3))
        .toDF("step", "vec_id", "dist_q")
      cent.join(counts, Seq("step")).orderBy("step")
    },

    // ── s22: MMR RERANKING — maximal marginal relevance (Carbonell &
    // Goldstein 1998): from a relevance pool, greedily pick k results
    // maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the standard
    // diversity rerank between retrieval and the user (RAG context
    // assembly: k near-identical top hits waste the context window).
    // λ = 0.7, pool = top-20 by cosine vs anchor vec 0, k = 5.
    // Determinism: every cosine is ONE IEEE division of an exact
    // integer dot by a product of exact-int-derived norms — correctly
    // rounded, order-free, bit-identical across engines — then FLOORED
    // to ppm, so the greedy argmax, the 7·rel − 3·maxsim scoring
    // (λ ×10, pure integers) and all tie-breaks replay exactly in the
    // SQL unroll. Scale: the POOL is the only corpus-sized work (one
    // TakeOrdered top-20 — linear, and in production the arm is the
    // already-indexed s20/s18 machinery); the rerank touches
    // ≤ k·|pool| rows at ANY corpus size, selected vectors riding the
    // plan as literals (the s21 discipline — no join, no broadcast
    // table).
    "s22_mmr_rerank" -> { (s, d) =>
      val k = 5
      val poolN = 20
      val v = vecs(s, d)
      val anchor = v.filter(col("vec_id") === 0)
        .select(col("qv").as("va"), col("norm").as("qn"))
      val pool = v.filter(col("vec_id") > 0)
        .select(col("vec_id").as("id"), col("qv"), col("norm"))
        .crossJoin(broadcast(anchor))
        .withColumn("rel_ppm",
          floor(dot_long(col("qv"), col("va")) / (col("qn") * col("norm"))
            * lit(1000000.0)))
        .select(col("id"), col("rel_ppm"), col("qv"), col("norm"))
        .orderBy(col("rel_ppm").desc, col("id").asc).limit(poolN)
        .localCheckpoint(true) // ≤20 rows from here on
      def simTo(cVec: IndexedSeq[Long], cNorm: Double): Column =
        floor(dot_long(col("qv"), typedLit(cVec)) /
          (col("norm") * lit(cNorm)) * lit(1000000.0))
      val first = pool.orderBy(col("rel_ppm").desc, col("id").asc).limit(1)
        .select(col("id"), col("rel_ppm"), col("qv"), col("norm")).head()
      // (step, id, rel_ppm, score10_ppm, qv, norm); step 1 has no
      // diversity penalty: score = 7·rel
      var sel = Vector((1, first.getLong(0), first.getLong(1),
        7L * first.getLong(1), first.getSeq[Long](2).toIndexedSeq,
        first.getDouble(3)))
      for (step <- 2 to k) {
        val maxSim = sel.map(c => simTo(c._5, c._6))
          .reduceLeft((a, b) => greatest(a, b))
        val nxt = pool.filter(!col("id").isin(sel.map(_._2): _*))
          .select(col("id"), col("rel_ppm"),
            (lit(7L) * col("rel_ppm") - lit(3L) * maxSim).as("score"),
            col("qv"), col("norm"))
          .orderBy(col("score").desc, col("id").asc).limit(1).head()
        sel = sel :+ ((step, nxt.getLong(0), nxt.getLong(1), nxt.getLong(2),
          nxt.getSeq[Long](3).toIndexedSeq, nxt.getDouble(4)))
      }
      import s.implicits._
      sel.map(c => (c._1, c._2, c._3, c._4))
        .toDF("step", "id", "rel_ppm", "score10_ppm").orderBy("step")
    },

    // LSH-bucketed ANN: 6 deterministic pseudo-random hyperplanes →
    // 64-bucket space; candidates share a bucket; rerank inside.
    // Hyperplane j component at dim d: ((j*64+d)*2654435761) % 97 - 48
    // (Knuth multiplicative hash → small signed weight).
    "s2_lsh_ann" -> { (s, d) =>
      // bucket = sign pattern of 6 hyperplane projections — one
      // compiled pass per vector (HyperplaneBucket), no plane-table
      // join, no per-plane shuffle; pairing shuffles only on the
      // bucket key.
      val v = vecs(s, d)
        .withColumn("bucket", hyperplane_bucket(col("qv"), 6))
      val a = v.select(col("vec_id").as("qid"), col("qv").as("va"),
        col("norm").as("qn"), col("bucket"))
      val b = v.select(col("vec_id").as("vid"), col("qv").as("vb"),
        col("norm").as("vn"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("qid") < col("vid"))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") === 1)
        .select(col("qid"), col("bucket"), col("vid"),
          round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid")
    },

    // embedding cosine near-dup pairs (threshold 0.45 (corpus max pair cosine is ~0.51 — no planted dups; threshold tuned to yield a bounded, non-empty result))
    "s3_cosine_neardup" -> { (s, d) =>
      // Exact all-pairs as a broadcast nested-loop join: one side goes
      // through Spark's own broadcast machinery (size-guarded, spills,
      // shows in the plan — round 2 drove this with a driver-side
      // collect(), which bypassed every guardrail), and the dot product
      // per candidate pair is the compiled DotLong expression inside
      // whole-stage codegen. At 100 TB the all-pairs pass is gated by
      // s2's LSH buckets — this is the exactness baseline.
      val v = vecs(s, d)
      val a = v.select(col("vec_id").as("da"), col("qv").as("va"), col("norm").as("na"))
      val b = v.select(col("vec_id").as("db"), col("qv").as("vb"), col("norm").as("nb"))
      a.join(broadcast(b), col("da") < col("db"))
        .withColumn("cos_raw", dotCol / (col("na") * col("nb")))
        .filter(col("cos_raw") >= 0.45)
        .select(col("da"), col("db"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("da", "db")
    },

    // IVF ANN: coarse quantizer cells + in-cell search. Centroids are
    // the first 8 vectors (deterministic stand-in for an offline
    // k-means); every vector is assigned to its nearest centroid by
    // exact integer L2; queries probe ONLY their own cell. At 100 TB
    // the cell assignment is the partition key — a probe touches one
    // partition, not the corpus.
    "s4_ivf_ann" -> { (s, d) =>
      val v = vecs(s, d)
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qv").as("cv"))
      val assigned = v.crossJoin(broadcast(cents))
        // |a−b|² = a·a − 2a·b + b·b, three compiled integer dots —
        // exact, and avoids an interpreted zip_with per (vector, cell)
        .withColumn("dist2",
          dot_long(col("qv"), col("qv")) - lit(2L) * dot_long(col("qv"), col("cv"))
            + dot_long(col("cv"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("cid").asc)))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("norm"), col("cid").as("cell"))
      val q = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("qv").as("va"), col("norm").as("qn"), col("cell"))
      val t = assigned.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("vid"), col("qv").as("vb"), col("norm").as("vn"), col("cell"))
      t.join(broadcast(q), Seq("cell"))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") === 1)
        .select(col("qid"), col("cell"), col("vid"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid")
    },

    // per-label centroids — the prototype/centroid update every
    // embedding pipeline runs (class prototypes, k-means steps, drift
    // monitors). Relational spelling: explode components, partial-sum
    // map-side, shuffle only (label, dim) partial aggregates — the 64×
    // row expansion never crosses the wire. Integer sums (quantized
    // components) keep the mean order-independent and engine-exact.
    "s5_label_centroids" -> { (s, d) =>
      Tables.load(s, d, "embeddings")
        .select(col("label"), posexplode(
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
          .as(Seq("dim", "q")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
        .select(col("label"), col("dim"),
          round(col("sq").cast("double") / col("n") / 1e6, 6).as("centroid"))
        .orderBy("label", "dim")
    },

    // ── s7: k-NN label prediction — the classification read of the
    // similarity surface: each query vector takes the majority label
    // of its 10 nearest (cosine) neighbors, ties broken to the
    // smallest label. Same broadcast-query + per-row compiled-dot
    // shape as s1 — the label join adds one broadcast lookup, and the
    // vote is a tiny (qid, label) hash aggregate. At 100 TB the
    // neighbor search gates through s2/s4 buckets first; the voting
    // stage is unchanged.
    "s7_knn_label" -> { (s, d) =>
      val lab = Tables.load(s, d, "embeddings")
        .select(col("vec_id").as("vid"), col("label"))
      val v = vecs(s, d)
      val q = v.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("qv").as("va"), col("norm").as("qn"))
      val t = v.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("vid"), col("qv").as("vb"), col("norm").as("vn"))
      t.join(broadcast(q))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") <= 10)
        .join(broadcast(lab), Seq("vid"))
        .groupBy("qid", "label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("votes").desc, col("label").asc)))
        .filter(col("rn") === 1)
        .select(col("qid"), col("label").as("pred_label"), col("votes"))
        .orderBy("qid")
    },

    // ── s6: per-vector array statistics — dimension, exact quantized
    // L2², component min/max. Pure per-row array math (size /
    // compiled dot / array_min / array_max): no explode, no shuffle —
    // the embarrassingly-parallel shape that survives any corpus
    // size. The vec_id bound only keeps the oracle small.
    "s6_vector_stats" -> { (s, d) =>
      Tables.load(s, d, "embeddings")
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("qv"),
          round(expr("CAST(array_min(embedding) AS DOUBLE)"), 4).as("min_c"),
          round(expr("CAST(array_max(embedding) AS DOUBLE)"), 4).as("max_c"))
        .withColumn("l2sq", dot_long(col("qv"), col("qv")))
        .select("vec_id", "dim", "l2sq", "min_c", "max_c")
        .orderBy("vec_id")
    },

    // ── s8: semantic clusters — the embedding-space analog of
    // d5+d8: LSH-bucketed cosine pairs (the s2 scale path, never
    // all-pairs) → connected components → one representative per
    // cluster (min vec_id) with size and label. This is the "semantic
    // dedup" read of the similarity surface: at 100 TB the candidate
    // generation is the bucket equi-join, the CC loop is the
    // pointer-jumped O(log diameter) iteration shared with d5, and
    // the rep join touches |clusters| rows.
    "s8_semantic_clusters" -> { (s, d) => semanticClustersAuto(s, d) },

    // ── s9: ANN quality harness — recall@1 of the LSH bucket search
    // (s2's index) against brute-force ground truth on a query sample
    // (vec_id < 50), for single-probe AND Hamming-1 multi-probe (the
    // production recall knob: probe the exact bucket plus the 6
    // one-bit-flip neighbors — 7 equi-join keys, not a distance join).
    // This is how index quality is actually monitored at 100 TB: the
    // query sample is tiny by definition → broadcast to BOTH sides;
    // the exact side is one corpus sweep per batch of queries (never
    // an all-pairs self-join), the LSH sides answer from buckets, and
    // the comparison is a one-row aggregate. A query whose probed
    // buckets hold no other vector scores a miss — recall measures the
    // index as served, not just its rerank.
    "s9_ann_recall" -> { (s, d) => annRecall(s, d, nPlanes = 6) },

    // ── s10: product-quantization codes — the compression layer a
    // 100 TB vector store actually serves from: each 64-d vector is
    // split into M=8 sub-vectors, each assigned to its nearest of K=4
    // per-subspace centroids (deterministic stand-in codebook = the
    // first K vectors' sub-vectors, s4's convention), packing a
    // 256-byte embedding into a 16-bit code (2 bits × 8). The exact
    // integer reconstruction error per vector is emitted as the
    // codebook-quality monitor. Shape: one in-row explode to (vector,
    // subspace), a broadcast of the K×M codebook, compiled integer
    // dot products for the distances, min_by with a total (dist, k)
    // order (tie → lowest code, engine-independent), and two partial
    // aggregates keyed by vec_id — nothing quadratic, nothing
    // interpreted.
    "s10_pq_codes" -> { (s, d) =>
      pqDists(s, d)
        .groupBy("vec_id", "m")
        .agg(min_by(struct(col("k"), col("dist2")),
          struct(col("dist2"), col("k"))).as("b"))
        .select(col("vec_id"), col("m"), col("b.k").as("k"), col("b.dist2").as("dist2"))
        .groupBy("vec_id")
        .agg(sum(expr("k * CAST(shiftleft(1, 2 * m) AS BIGINT)")).as("pq_code"),
          sum("dist2").as("recon_err"))
        .orderBy("vec_id")
    },

    // ── s11: PQ asymmetric-distance (ADC) top-k — the serving path of
    // a PQ index: targets exist ONLY as their 2-bit-per-subspace codes
    // (s10), a query precomputes its 8×4 distance table to the
    // codebook, and the approximate distance is 8 table lookups summed
    // — the raw target vectors are never touched at query time. Shape:
    // the distance table (|queries|×8×4 rows) broadcasts; the code
    // join is an equi-join on (subspace, code digit); per-(query,
    // target) sums are partial aggregates; WindowGroupLimit takes
    // top-5 per query. All integer-exact, so the engines agree on
    // every distance and tie.
    "s11_pq_adc_topk" -> { (s, d) =>
      val dists = pqDists(s, d).localCheckpoint(true) // feeds codes + the distance table
      val assign = dists.filter(col("vec_id") >= 5)
        .groupBy("vec_id", "m")
        .agg(min_by(col("k"), struct(col("dist2"), col("k"))).as("k"))
      val dtable = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("m"), col("k"), col("dist2"))
      assign.join(broadcast(dtable), Seq("m", "k"))
        .groupBy(col("qid"), col("vec_id").as("vid"))
        .agg(sum("dist2").as("adist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("adist").asc, col("vid").asc)))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vid", "adist")
        .orderBy("qid", "rank")
    },

    // ── s16: IVF + PQ-ADC composed — the SERVING STACK of a real
    // 100 TB vector store (FAISS's IVFPQ shape): the coarse quantizer
    // (s4's 8 cells) restricts candidates to the query's cell FIRST,
    // then the ADC lookup (s11) scores only those cell-mates from
    // their 2-bit-per-subspace codes — raw target vectors are touched
    // by neither stage at query time. The order of operations IS the
    // scale story: the cell gate runs before the ×M code explode, so
    // ADC work is M·|cell|, not M·|corpus|; the cell assignment is
    // the partition key at scale (a probe touches one partition), the
    // distance table (|q|×M×K rows) and query-cell map broadcast.
    // All integer-exact (compiled dots, BIGINT sums) — both engines
    // agree on every distance and tie (vid asc).
    "s16_ivfpq_topk" -> { (s, d) =>
      val v = vecs(s, d)
      // coarse cells — s4's convention: centroids = first 8 vectors,
      // exact integer L2 via the |a−b|² = a·a − 2a·b + b·b identity
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qv").as("cv"))
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("dist2",
          dot_long(col("qv"), col("qv")) - lit(2L) * dot_long(col("qv"), col("cv"))
            + dot_long(col("cv"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("cid").asc)))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cell"))
        .localCheckpoint(true) // feeds the query map + the target gate
      val qCell = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("cell"))
      val tCell = assigned.filter(col("vec_id") >= 5)
      // PQ codes + per-query distance table — s10/s11's shared chain
      val dists = pqDists(s, d).localCheckpoint(true)
      val codes = dists.filter(col("vec_id") >= 5)
        .groupBy("vec_id", "m")
        .agg(min_by(col("k"), struct(col("dist2"), col("k"))).as("k"))
      val dtable = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("m"), col("k"), col("dist2"))
      // IVF gate FIRST (cell-mates only), then the ×M code join + ADC
      tCell.join(broadcast(qCell), Seq("cell"))
        .join(codes, Seq("vec_id"))
        .join(broadcast(dtable), Seq("qid", "m", "k"))
        .groupBy(col("qid"), col("vec_id").as("vid"), col("cell"))
        .agg(sum("dist2").as("adist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("adist").asc, col("vid").asc)))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "vid", "adist", "cell")
        .orderBy("qid", "rank")
    },

    // ── s12: scalar (uint8) quantization codes — PQ's simpler sibling
    // and the other standard vector-store compression: per-DIMENSION
    // global [min, max] over the corpus, each component mapped to its
    // nearest of 256 evenly spaced levels. Everything stays integer-
    // exact: components are already integer millionths (qv), and
    // nearest-level rounding is spelled as the integer floor division
    // ((x−mn)·510 + (mx−mn)) div (2·(mx−mn)) — i.e. ⌊(x−mn)·255/(mx−mn)
    // + ½⌋ with no floating point, so both engines agree on every code
    // and every tie. The reconstruction residual is carried ×255 so it
    // is also an exact integer; recon_err is its summed square (the
    // codebook-quality monitor, in (millionth/255)² units). Shape: one
    // 64-row per-dim min/max agg collapsed to a single broadcast
    // bounds row, then pure in-row transforms — one scan, one tiny
    // shuffle, nothing quadratic, no driver collect.
    "s12_sq_codes" -> { (s, d) =>
      val q = vecs(s, d).select(col("vec_id"), col("qv"))
      val bounds = q
        .select(posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("b"))
      q.crossJoin(broadcast(bounds))
        .withColumn("codes", expr(
          """transform(qv, (x, i) ->
               CASE WHEN b[i].mx = b[i].mn THEN 0
                    ELSE CAST(((x - b[i].mn) * 510 + (b[i].mx - b[i].mn))
                              DIV (2 * (b[i].mx - b[i].mn)) AS INT) END)"""))
        .withColumn("errs", expr(
          """transform(sequence(0, size(qv) - 1), i ->
               (qv[i] - b[i].mn) * 255 - CAST(codes[i] AS BIGINT) * (b[i].mx - b[i].mn))"""))
        // codes ship as the joined string — the one cross-engine-safe
        // spelling of an array cell in the driver's hash compare
        .select(col("vec_id"),
          expr("array_join(codes, ',')").as("codes"),
          expr("aggregate(transform(errs, e -> e * e), CAST(0 AS BIGINT), (a, e) -> a + e)")
            .as("recon_err"))
        .orderBy("vec_id")
    },

    // ── s13: one Lloyd assignment step (k-means, k = 8, seeds =
    // vec_id < 8) — the clustering primitive under IVF cell builds
    // (s4) and corpus bucketing: every vector goes to its nearest
    // centroid by exact quantized L2², reported per centroid as
    // population + inertia. Identity |v−c|² = v·v + c·c − 2·v·c keeps
    // every distance in the compiled DotLong expression (three per-row
    // integer dots, no explode, no 64× component shuffle); the seed
    // side broadcasts, so assignment is map-side over the corpus and
    // the only shuffle carries k rows. Ties break to the lowest
    // centroid id via a lexicographic struct-min. A full k-means run
    // is this step iterated with s5-style centroid recomputation;
    // inertia is the convergence scalar. Overflow: worst-case |v−c|²
    // for unit-scale 64-d quantized vectors is 4·(10⁶)²·64 ≈ 2.6e14,
    // so an int64 inertia is safe to ~3.6e4 worst-case vectors per
    // centroid (real nearest-centroid distances sit far below worst
    // case); a corpus-scale run swaps the accumulator to
    // DECIMAL(38,0) (x5's pattern).
    "s13_kmeans_assign" -> { (s, d) =>
      val v = vecs(s, d).select(col("vec_id"), col("qv"),
        dot_long(col("qv"), col("qv")).as("vv"))
      val seeds = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("sid"), col("qv").as("sv"), col("vv").as("ss"))
      v.crossJoin(broadcast(seeds))
        .withColumn("d2",
          col("vv") + col("ss") - lit(2L) * dot_long(col("qv"), col("sv")))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("sid"))).as("m"))
        .select(col("vec_id"), col("m.sid").as("centroid_id"), col("m.d2").as("d2"))
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("n_assigned"), sum("d2").as("inertia"))
        .withColumn("mean_dist", expr("inertia div n_assigned"))
        .orderBy("centroid_id")
    },

    // ── s15: Matryoshka (truncated-dimension) recall — the
    // dimension/recall tradeoff read a serving team runs before
    // shipping truncated embeddings: top-1 agreement between the full
    // 64-d cosine order and its 16-d / 32-d PREFIX orders, over the
    // same bounded query panel as s9. The slices are in-row
    // (`slice` + compiled dots — no explode), the panel broadcasts,
    // and the corpus is scanned once; at index scale the truncated
    // dot is the cheap first pass this query tells you whether you
    // can afford. Ties break by vid, so the doubles-from-exact-ints
    // ranking is engine-stable (s9's proven bargain).
    "s15_matryoshka_recall" -> { (s, d) =>
      val base = vecs(s, d)
        .withColumn("qv16", expr("slice(qv, 1, 16)"))
        .withColumn("qv32", expr("slice(qv, 1, 32)"))
        .withColumn("n16", sqrt(dot_long(col("qv16"), col("qv16")).cast("double")))
        .withColumn("n32", sqrt(dot_long(col("qv32"), col("qv32")).cast("double")))
        .localCheckpoint(true) // query panel + target side share the slices
      val q = base.filter(col("vec_id") < 50).select(
        col("vec_id").as("qid"), col("qv").as("va"), col("norm").as("qn"),
        col("qv16").as("va16"), col("n16").as("qn16"),
        col("qv32").as("va32"), col("n32").as("qn32"))
      val t = base.select(
        col("vec_id").as("vid"), col("qv").as("vb"), col("norm").as("vn"),
        col("qv16").as("vb16"), col("n16").as("vn16"),
        col("qv32").as("vb32"), col("n32").as("vn32"))
      val cand = t.crossJoin(broadcast(q)).filter(col("qid") =!= col("vid"))
        .withColumn("cos64", dotCol / (col("qn") * col("vn")))
        .withColumn("cos16",
          dot_long(col("va16"), col("vb16")) / (col("qn16") * col("vn16")))
        .withColumn("cos32",
          dot_long(col("va32"), col("vb32")) / (col("qn32") * col("vn32")))
      def top1(c: String, out: String): DataFrame = cand
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col(c).desc, col("vid").asc)))
        .filter(col("rank") === 1).select(col("qid"), col("vid").as(out))
      val full = top1("cos64", "fvid")
      full.join(top1("cos16", "v16"), "qid").join(top1("cos32", "v32"), "qid")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("v16") === col("fvid"), 1L).otherwise(0L)).as("n_hits_16"),
          sum(when(col("v32") === col("fvid"), 1L).otherwise(0L)).as("n_hits_32"))
        .select(col("n_queries"),
          col("n_hits_16"),
          round(col("n_hits_16") / col("n_queries").cast("double"), 4).as("recall_16"),
          col("n_hits_32"),
          round(col("n_hits_32") / col("n_queries").cast("double"), 4).as("recall_32"))
    },

    // ── s14: dominant principal component by POWER ITERATION — the
    // one-vector PCA a corpus pipeline runs before whitening /
    // debiasing embeddings, expressed as two gram-matrix-free BSP
    // rounds (the k-means/PageRank shape applied to linear algebra):
    // ── s17: SemDeDup — embedding-space semantic dedup as the KEEP
    // LIST a pipeline actually applies (Abbas et al. 2023's shape):
    // LEARNED k-means cells gate the pair search (2-round Lloyd +
    // two-level routed assignment, [[IvfIndex]] — at 100 TB the cell
    // is the partition key and no pair ever crosses cells),
    // within-cell cosine ≥ τ edges feed transitive CC, and
    // every vector gets its component's min id as `rep_id` with
    // is_kept = (self == rep). Differs from s8 on all three axes that
    // matter operationally: learned-centroid cells instead of random
    // hyperplanes (skew follows the data), per-VECTOR verdict instead
    // of per-cluster summary (directly joinable as a dedup filter),
    // and singletons present (a keep list must cover the corpus).
    // Labels side of the final join is cluster-members-only →
    // broadcast; the corpus is never shuffled after assignment.
    "s17_semdedup" -> { (s, d) =>
      val v = vecs(s, d)
      // ENGINE-SIZED cell count, the autoPlanes rule on the IVF axis:
      // k = max(8, min(⌈N/256⌉, 4⌈√N⌉, 2²⁰)) holds expected cell
      // occupancy ≤ ~256 while N ≤ 2²⁰ (fixed k would grow occupancy
      // — and pairs — quadratically, s8's frozen-plane wall on this
      // index family) and caps the index + training size past it
      // ([[autoCells]]). Resolves to 8 at every shipped SF and to 79
      // cells at the 10× probe corpus — the caps bind only past 2²⁰
      // vectors; the oracle computes the same k in SQL. Centroids are LEARNED — 2 Lloyd rounds from
      // the first-k init ([[IvfIndex.lloydCentroids]]), so occupancy
      // follows data skew — and BOTH the training assignments and the
      // final corpus assignment go through the TWO-LEVEL router
      // ([[IvfIndex.routeAssign]]): O(N·√k) dots with a √k-row coarse
      // broadcast, closing the r11 gap where flat N·k assignment was
      // O(N²/256) with a linearly-growing centroid broadcast.
      val n = Tables.load(s, d, "embeddings").count()
      val k = autoCells(n)
      // centroids SERVED from the IndexStore sidecar (train-once/
      // serve-many): the 2 Lloyd rounds run on the first consumer of
      // this corpus state; s17/s18/s19 share the one k-row table.
      // Training input is STRIDE-SAMPLED to ~64 vectors/cell
      // ([[IvfIndex.trainStride]]) — the full corpus is routed, never
      // fully trained on
      val cents = IvfIndex.servedCentroids(s, d, "embeddings",
        v.select(col("vec_id"), col("qv")), k, rounds = 2,
        stride = IvfIndex.trainStride(n, k))
      val assigned = IvfIndex.routeAssign(v, cents, IvfIndex.autoCoarseCells(k))
        .select(col("vec_id"), col("qv"), col("norm"), col("cell"))
        .localCheckpoint(true) // pair search + final keep-list join
      val a = assigned.select(col("vec_id").as("da"), col("qv").as("va"),
        col("norm").as("na"), col("cell"))
      val b = assigned.select(col("vec_id").as("db"), col("qv").as("vb"),
        col("norm").as("nb"), col("cell"))
      val pairs = a.join(b, Seq("cell")).filter(col("da") < col("db"))
        .withColumn("cos_raw", dotCol / (col("na") * col("nb")))
        .filter(col("cos_raw") >= 0.40)
        .select("da", "db").localCheckpoint(true)
      val labels = DedupQueries.connectedComponents(pairs)
        .withColumnRenamed("doc_id", "vec_id")
      assigned.join(broadcast(labels), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          coalesce(col("cluster_id"), col("vec_id")).as("rep_id"))
        .withColumn("is_kept", col("rep_id") === col("vec_id"))
        .orderBy("vec_id")
    },

    // ── s18: FILTERED vector search — top-k cosine under a metadata
    // predicate, the query shape every production vector store serves
    // ("nearest neighbors among docs where label ≤ 3"). The two
    // decisions that matter at 100 TB, both visible in the plan:
    // (1) PRE-filter: the predicate is applied to the candidate scan
    // BEFORE any vector math or cell routing, so it reaches the
    // parquet reader as a pushed filter (`PushedFilters: [LE(label,
    // 3)]`) and partition pruning applies when the corpus is
    // label-partitioned — post-filtering (search first, filter the
    // top-k after) would return < k rows whenever the filter is
    // selective, the classic filtered-ANN failure.
    // (2) PROBE WIDENING, ENGINE-SIZED: filtering thins every IVF
    // cell by the predicate's selectivity, so a single-cell probe
    // (s4) sees ~sel·occupancy candidates and recall collapses as
    // sel→0. The engine derives the probe count itself —
    // [[autoProbeCells]]: ⌈1/sel⌉ from one cheap dual-count pass,
    // clamped to [2, nCells] — the same one-measurement→decision
    // pattern as autoPlanes/autoCells/JoinAdvisor (a hand-set probe
    // constant would be s8's frozen-plane wall wearing a new hat: any
    // fixed depth is wrong as soon as the filter changes). At 40%
    // selectivity this resolves to 3 probe cells, restoring ~s4's
    // effective candidate count. The probe set stays a per-query
    // constant, so the candidate join remains a broadcast equi-join
    // on the cell key — never a corpus scan per query.
    "s18_filtered_ann" -> { (s, d) =>
      val raw = Tables.load(s, d, "embeddings")
      val quant =
        expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
      def prep(df: DataFrame): DataFrame =
        df.select(col("vec_id"), col("label"), quant.as("qv"))
          .withColumn("norm", sqrt(dot_long(col("qv"), col("qv")).cast("double")))
      // selectivity AND corpus size measured in ONE scan (count +
      // conditional count, the JoinAdvisor dual-stat idiom); the
      // result is a driver-side scalar pair, never a data collect
      val stats = raw.agg(count(lit(1)).as("n"),
        sum(when(col("label") <= 3 && col("vec_id") >= 5, 1L).otherwise(0L)).as("nf"))
        .head()
      // index built on the UNFILTERED corpus (filters arrive at query
      // time, long after the index), ENGINE-SIZED on the cell axis
      // (r11 ask #6: autoCells instead of the hard-coded 8) with
      // LEARNED centroids; corpus-side assignment goes through the
      // two-level router — O(N·√k), the s17 scale path
      val k = autoCells(stats.getLong(0))
      val cents = IvfIndex.servedCentroids(s, d, "embeddings",
        prep(raw).select(col("vec_id"), col("qv")), k, rounds = 2,
        stride = IvfIndex.trainStride(stats.getLong(0), k))
      val probes = autoProbeCells(stats.getLong(0), stats.getLong(1), nCells = k)
      val cand = IvfIndex.routeAssign(
        prep(raw.filter(col("label") <= 3 && col("vec_id") >= 5)),
        cents, IvfIndex.autoCoarseCells(k))
        .select(col("vec_id").as("vid"), col("label"), col("qv").as("vb"),
          col("norm").as("vn"), col("cell"))
      // query side: a HANDFUL of probe vectors ranks the full k-cell
      // centroid list (k dots per query — the standard per-query
      // nprobe scan; at k past ~10⁶ the router applies here too) —
      // probe depth stays engine-derived from measured selectivity
      val q = prep(raw.filter(col("vec_id") < 5)).crossJoin(broadcast(cents))
        .withColumn("dist2",
          dot_long(col("qv"), col("qv")) - lit(2L) * dot_long(col("qv"), col("cv"))
            + dot_long(col("cv"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("cid").asc)))
        .filter(col("rn") <= probes)
        .select(col("vec_id").as("qid"), col("qv").as("va"),
          col("norm").as("qn"), col("cid").as("cell"))
      // vid lives in exactly one cell and a query's probe cells are
      // distinct ⇒ each (qid, vid) pair appears at most once — no
      // dedup stage needed before ranking
      cand.join(broadcast(q), Seq("cell"))
        .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vid"), col("label"), col("cell"),
          round(col("cos_raw"), 4).as("cosine"))
        .orderBy("qid", "rank")
    },

    // ── s19: the IVF index card — per-cell occupancy + exact integer
    // inertia under the LEARNED (2-round Lloyd) centroids and routed
    // assignment. This is the statistic an index operator watches:
    // occupancy skew is the pair-work bound of s17 and the probe-cost
    // bound of s18, and Lloyd exists precisely to flatten it (the
    // planted-skew drop vs first-k init is spec-pinned in
    // LloydRoutingSpec; this query pins the table-backed trajectory
    // cross-engine). Cost shape = one routed assignment, O(N·√k).
    "s19_ivf_lloyd" -> { (s, d) =>
      val v = vecs(s, d)
      val n = Tables.load(s, d, "embeddings").count()
      val k = autoCells(n)
      val cents = IvfIndex.servedCentroids(s, d, "embeddings",
        v.select(col("vec_id"), col("qv")), k, rounds = 2,
        stride = IvfIndex.trainStride(n, k))
      IvfIndex.routeAssign(v.select(col("vec_id"), col("qv")), cents,
        IvfIndex.autoCoarseCells(k))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_assigned"), sum("cell_dist2").as("inertia"))
        .orderBy("cell")
    },

    // w ← Aᵀ(A v) is ONE scan — the dot x·v is a compiled in-row
    // fold against a broadcast 64-long array (never a 64-way join),
    // the per-dimension reassembly a 64-key map-combined groupBy —
    // so each round shuffles 64·partitions rows, independent of N.
    // All arithmetic integer (millis in, truncating DIV rescales
    // between rounds: v1 = w1 DIV 64N keeps v1 ≤ 1e6; dot1 DIV 1024
    // caps the round-2 addend at 6.25e10/row, int64-safe to ~1.4e8
    // rows — corpus-scale runs widen the w2 accumulator to
    // DECIMAL(38,0), a17's pattern). v0 = 1⃗, so the sign convention
    // is deterministic; no sqrt anywhere — the oracle replays the
    // exact trajectory, and the spec checks convergence (round-2
    // direction explains more variance than round-1).
    "s14_pca_power" -> { (s, d) =>
      val emb = Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
            .as("xm"))
        .localCheckpoint(true) // reused by both rounds
      val cnt = emb.agg(count(lit(1)).as("n"))
      val w1 = emb
        .select(expr("aggregate(xm, 0L, (a, x) -> a + x)").as("dot0"),
          posexplode(col("xm")).as(Seq("dim", "x")))
        .groupBy("dim").agg(sum(expr("x * dot0")).as("w1"))
      val v1 = w1.crossJoin(broadcast(cnt))
        .select(col("dim"), col("w1"), expr("w1 DIV (n * 64)").as("v1"))
      val v1arr = v1.agg(
        expr("transform(array_sort(collect_list(struct(dim, v1))), p -> p.v1)")
          .as("v1arr"))
      val w2 = emb.crossJoin(broadcast(v1arr))
        .select(col("xm"),
          expr("aggregate(zip_with(xm, v1arr, (x, v) -> x * v), 0L, (a, e) -> a + e) DIV 1024")
            .as("t1"))
        .select(expr("t1"), posexplode(col("xm")).as(Seq("dim", "x")))
        .groupBy("dim").agg(sum(expr("x * t1")).as("w2"))
      v1.join(w2, "dim").crossJoin(broadcast(cnt))
        .select(col("dim"), col("v1"), expr("w2 DIV n").as("v2"))
        .orderBy("dim")
    }
  )

  /** ENGINE-SIZED plane count (r10 verdict ask #1): the LSH index is
    * only linear in corpus size if the plane count tracks log₂(N) —
    * in-bucket candidate pairs grow as N²/2^planes, so a frozen plane
    * count is a measured quadratic wall (SCALE.md r10: candidates 98×
    * at 10× with planes pinned at 6). This is the standard LSH-forest
    * occupancy rule: hold E[bucket size] = N/2^planes at
    * `targetOccupancy` ⇒ planes = ⌈log₂(N/occupancy)⌉, floored so a
    * tiny corpus keeps enough planes for the buckets to mean anything.
    * The rule is exact at power-of-two boundaries (both log2 inputs
    * are exactly representable doubles there) and monotone in N —
    * spec-pinned in SimilaritySizingSpec. */
  def autoPlanes(n: Long, targetOccupancy: Long = 32L, floor: Int = 6): Int = {
    require(targetOccupancy > 0, s"targetOccupancy must be > 0, got $targetOccupancy")
    if (n <= targetOccupancy) floor
    else math.max(floor,
      math.ceil(math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt)
  }

  /** s8 with the plane count chosen BY THE ENGINE from the corpus: one
    * cheap count pass (parquet row-group metadata — no column reads)
    * sizes the index, then the clustering runs at that width. At the
    * shipped SFs the rule resolves to the floor (500 and 2000 vectors
    * ÷ 32 occupancy < 2⁶), so the pinned DuckDB oracle is unchanged;
    * at the 10× probe corpus it resolves to 10 planes — the measured
    * ~5.9× scale path — with no caller-supplied parameter. At 100 TB
    * the count is the same one-scan ANALYZE statistic the join advisor
    * collects; recall at widened counts is re-validated through s9's
    * harness ([[annRecall]], spec-gated). */
  def semanticClustersAuto(s: SparkSession, d: String,
      targetOccupancy: Long = 32L): DataFrame = {
    val n = Tables.load(s, d, "embeddings").count()
    semanticClusters(s, d, autoPlanes(n, targetOccupancy))
  }

  /** s8's body with the LSH plane count as THE scale knob. In-bucket
    * candidate pairs grow as N²/2^planes, so a FIXED plane count is
    * quadratic in corpus size — the index only stays linear if
    * `nPlanes` tracks log₂(N) (expected bucket occupancy constant,
    * the standard LSH-forest sizing). [[semanticClustersAuto]] applies
    * that rule automatically; `ScaleProbe` measures both the fixed-6
    * wall (the quadratic wall) and the auto-sized count (the 100 TB
    * path). More planes trade recall for candidates exactly like any
    * LSH index — the knob is validated against s9's recall harness
    * ([[annRecall]]). */
  /** Multiprobe DEPTH as an engine rule, paired with [[autoPlanes]]:
    * widening the index shrinks each query's probed FRACTION of the
    * bucket space (Hamming-1 probes p+1 of 2^p buckets), which is the
    * measured recall cost of auto-widening (SCALE.md r11). Holding the
    * fraction exactly constant would need exponentially many probes,
    * so the standard LSH-multiprobe compromise applies: grow the
    * Hamming RADIUS with the widening — one extra bit of radius per 4
    * extra planes. Probe count stays polynomial (Σ C(p,≤r); 56 at
    * p=10, r=2) and the probed-fraction slope flattens from 2× per
    * plane to ~2×/(p/r) — recall measured through [[annRecall]]. */
  def autoProbeRadius(nPlanes: Int, floor: Int = 6): Int =
    1 + math.max(0, nPlanes - floor + 3) / 4

  /** [[autoPlanes]]'s occupancy rule on the IVF axis (s17/s18/s19's
    * cell count), CAPPED: k = max(8, min(⌈N/256⌉, 4·⌈√N⌉, 2²⁰)).
    * The occupancy term holds expected cell occupancy ≤ ~256 so
    * within-cell pair work stays linear in N; uncapped it grows
    * forever, which makes the centroid relation — and the Lloyd
    * TRAINING input at ~64 vectors/cell ([[IvfIndex.trainStride]]) —
    * Θ(N) (the r12 verdict's open wall). The √N cap is the standard
    * IVF sizing band (FAISS trains k between √N and 16√N; 4√N sits in
    * the middle and leaves every shipped SF and the 10× probe corpus
    * on the occupancy rule — the cap binds past N ≈ 2²⁰ vectors), so
    * past it the centroid table is O(√N) and the training input
    * 64k = O(√N). The absolute 2²⁰ ceiling is the deployment k-max
    * (binds past N ≈ 2³⁶): beyond it the training input is a CONSTANT
    * 64·2²⁰ ≈ 6.7e7 vectors — the train-once cost stops growing with
    * the corpus entirely. Occupancy past the caps grows as √N (then
    * N/2²⁰): the within-cell stage trades linearity for a bounded
    * index, which every production IVF accepts (probe cost stays flat;
    * pair-style consumers like s17 shard cells or raise τ). Float
    * sqrt is exact-or-irrational at the CEIL boundary (a perfect
    * square's √ is exact in IEEE double below 2⁵²; a non-square's is
    * irrational), so the SQL oracles replay the identical
    * GREATEST/LEAST/CEIL arithmetic with no float-boundary drift.
    * The rule governs only the PAIR stage; the assignment stage is
    * linear only because it routes two-level
    * ([[IvfIndex.routeAssign]], O(N·√k)) — the r11 design assigned
    * flat at N·k = O(N²/256) dots with a linearly-growing centroid
    * broadcast, which the r12 router removed. */
  def autoCells(n: Long, targetOccupancy: Long = 256L, floor: Long = 8L,
      sqrtFactor: Long = 4L, kMax: Long = 1L << 20): Long = {
    require(targetOccupancy > 0, s"targetOccupancy must be > 0, got $targetOccupancy")
    val occupancyRuled = (n + targetOccupancy - 1) / targetOccupancy
    val sqrtCap = sqrtFactor * math.ceil(math.sqrt(n.toDouble)).toLong
    math.max(floor, (occupancyRuled min sqrtCap) min kMax)
  }

  /** Probe-cell count for FILTERED search (s18) — the sizing rule on
    * the probe axis: a metadata filter keeps nFiltered of nTotal
    * candidates, thinning every cell to ~sel·occupancy, so restoring
    * the unfiltered candidate count takes ⌈1/sel⌉ = ⌈nTotal/nFiltered⌉
    * probe cells. Floored at 2 (even a non-selective filter deserves
    * one widening step — the filter still perturbs which cell holds
    * the true neighbor) and capped at nCells (a hyper-selective filter
    * degrades to scanning every cell of the SURVIVORS — which is the
    * correct plan: at sel→0 the filtered set is small enough to scan).
    * Integer ceiling, so the SQL oracle replays it exactly
    * ((n + nf - 1) // nf — no float-boundary drift). */
  def autoProbeCells(nTotal: Long, nFiltered: Long, nCells: Long): Int = {
    require(nFiltered > 0, "filter selects nothing — no probe depth can help")
    math.min(nCells, math.max(2L, (nTotal + nFiltered - 1) / nFiltered)).toInt
  }

  /** s9's body with the plane count as a parameter — the recall
    * harness that validates ANY index width (fixed 6 for the pinned
    * oracle; the auto-sized widths from [[autoPlanes]] are re-checked
    * through this same harness, spec-gated). Single-probe plus
    * Hamming-≤`probeRadius` multi-probe (exact bucket + all
    * ≤radius-bit-flip neighbors — Σ C(nPlanes,≤r) equi-join keys over
    * the tiny query panel, never a distance join) against brute-force
    * ground truth on the vec_id < 50 query sample. */
  def annRecall(s: SparkSession, d: String, nPlanes: Int,
      probeRadius: Int = 1): DataFrame = {
    val base = vecs(s, d)
      .withColumn("bucket", hyperplane_bucket(col("qv"), nPlanes))
      .localCheckpoint(true) // feeds the query sample + both candidate sides
    val q = base.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("qv").as("va"),
        col("norm").as("qn"), col("bucket").as("qbucket"))
    // probe set: the query's bucket XOR every mask of ≤ probeRadius
    // bits — in-row explode of a driver-built literal list (bounded:
    // Σ C(planes, ≤r), e.g. 56 at planes=10 r=2)
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until nPlanes).combinations(r)
        .map(_.foldLeft(0L)((acc, b) => acc | (1L << b))).toSeq)
    val qProbes = q.withColumn("pbucket", explode(typedLit(masks)))
      .withColumn("pbucket", col("qbucket").bitwiseXOR(col("pbucket")))
    val t = base.select(col("vec_id").as("vid"), col("qv").as("vb"),
      col("norm").as("vn"), col("bucket").as("vbucket"))
    def top1(cand: DataFrame, out: String): DataFrame = cand
      .filter(col("qid") =!= col("vid"))
      .withColumn("cos_raw", dotCol / (col("qn") * col("vn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("vid").asc)))
      .filter(col("rank") === 1)
      .select(col("qid"), col("vid").as(out))
    val brute = top1(t.crossJoin(broadcast(q)), "bvid")
    val lsh1 = top1(t.join(broadcast(q), col("qbucket") === col("vbucket")), "lvid")
    val lshM = top1(t.join(broadcast(qProbes), col("pbucket") === col("vbucket")), "mvid")
    def hits(c: Column): Column = sum(when(c === col("bvid"), 1L).otherwise(0L))
    brute.join(lsh1, Seq("qid"), "left").join(lshM, Seq("qid"), "left")
      .agg(count(lit(1)).as("n_queries"),
        hits(col("lvid")).as("n_hits_1probe"),
        hits(col("mvid")).as("n_hits_multiprobe"))
      .select(col("n_queries"), col("n_hits_1probe"),
        round(col("n_hits_1probe") / col("n_queries").cast("double"), 4)
          .as("recall_1probe"),
        col("n_hits_multiprobe"),
        round(col("n_hits_multiprobe") / col("n_queries").cast("double"), 4)
          .as("recall_multiprobe"))
  }

  def semanticClusters(s: SparkSession, d: String, nPlanes: Int): DataFrame = {
    val v = vecs(s, d).withColumn("bucket", hyperplane_bucket(col("qv"), nPlanes))
    val a = v.select(col("vec_id").as("da"), col("qv").as("va"),
      col("norm").as("na"), col("bucket"))
    val b = v.select(col("vec_id").as("db"), col("qv").as("vb"),
      col("norm").as("nb"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("da") < col("db"))
      .withColumn("cos_raw", dotCol / (col("na") * col("nb")))
      .filter(col("cos_raw") >= 0.40)
      .select("da", "db").localCheckpoint(true)
    DedupQueries.connectedComponents(pairs)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      .join(Tables.load(s, d, "embeddings")
        .select(col("vec_id").as("cluster_id"), col("label")), Seq("cluster_id"))
      .select(col("cluster_id").as("rep_vec_id"), col("n_members"), col("label"))
      .orderBy("rep_vec_id")
  }

  /** Shared PQ front end for s10/s11: exact integer L2² from every
    * vector's M=8 sub-vectors to each of the K=4 per-subspace
    * centroids (codebook = the first K vectors' sub-vectors, s4's
    * stand-in convention). One in-row explode + a broadcast codebook
    * join + compiled dots. */
  private def pqDists(s: SparkSession, d: String): DataFrame = {
    val (mSub, kCent, dSub) = (8, 4, 8)
    val parts = vecs(s, d).select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${mSub - 1}), m -> struct(m AS m, slice(qv, m * $dSub + 1, $dSub) AS x))"))
      .as("p"))
      .select(col("vec_id"), col("p.m").as("m"), col("p.x").as("x"))
      .localCheckpoint(true) // feeds the codebook side + the assignment side
    val cents = parts.filter(col("vec_id") < kCent)
      .select(col("vec_id").as("k"), col("m"), col("x").as("c"))
    parts.join(broadcast(cents), Seq("m"))
      .withColumn("dist2",
        dot_long(col("x"), col("x")) - lit(2L) * dot_long(col("x"), col("c")) +
          dot_long(col("c"), col("c")))
      .select("vec_id", "m", "k", "dist2")
  }

  /** CTE chain replaying [[IvfIndex]] relationally: engine-sized k
    * (`kk`), coarse width kc = ⌈√k⌉ (`kcc`), training stride ⌈n/(64k)⌉
    * (`ss`) with its systematic sample (`ct` — [[IvfIndex.trainStride]]'s
    * ~64-per-cell cap), first-k-of-the-sample init centroids
    * (`cents0`, cids renumbered dense, exploded (cid, idx, q)), then per Lloyd round r: the
    * fine→coarse map (`f2c{r}`), each vector's coarse cell (`vc{r}`),
    * the routed fine assignment (`va{r}` — distances computed ONLY
    * against the winning coarse cell's fine centroids), and the
    * per-cell per-dimension integer mean carried over empty cells
    * (`cents{r+1}`). After `rounds` rounds one more routing pass
    * yields `assigned(vec_id, cell, dist2)`. Every step is exact
    * integer arithmetic with (dist2, id) tie-breaks, so DuckDB
    * replays the Spark trajectory bit-for-bit (DIV ≡ `//`: both
    * truncate toward zero — s14's proven bargain).
    *
    * The MATERIALIZED hints are load-bearing: DuckDB inlines CTEs, and
    * each round's centroid CTE references the previous round's several
    * times — uninlined, the expression tree (and execution) grows
    * combinatorially in the round count (measured: s17's oracle went
    * >400 s at sf0.01; materializing ct, the cents rounds and assigned
    * returns it to seconds and is semantics-free). */
  private def ivfRoutedSql(rounds: Int): String = {
    def routeCtes(r: Int, src: String): String =
      s"""fd$r AS (
            SELECT f.cid, ce.cid AS ccid,
              SUM((f.q - ce.q) * (f.q - ce.q)) AS dist2
            FROM cents$r f JOIN cents$r ce ON f.idx = ce.idx
              AND ce.cid < (SELECT kc FROM kcc)
            GROUP BY 1, 2),
          f2c$r AS (
            SELECT cid, ccid FROM (
              SELECT cid, ccid,
                row_number() OVER (PARTITION BY cid ORDER BY dist2, ccid) AS rn
              FROM fd$r) WHERE rn = 1),
          cd$r AS (
            SELECT v.vec_id, ce.cid AS ccid,
              SUM((v.q - ce.q) * (v.q - ce.q)) AS dist2
            FROM $src v JOIN cents$r ce ON v.idx = ce.idx
              AND ce.cid < (SELECT kc FROM kcc)
            GROUP BY 1, 2),
          vc$r AS (
            SELECT vec_id, ccid FROM (
              SELECT vec_id, ccid,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2, ccid) AS rn
              FROM cd$r) WHERE rn = 1),
          vd$r AS (
            SELECT v0.vec_id, f.cid,
              SUM((v.q - ce.q) * (v.q - ce.q)) AS dist2
            FROM vc$r v0
            JOIN f2c$r f ON f.ccid = v0.ccid
            JOIN c v ON v.vec_id = v0.vec_id
            JOIN cents$r ce ON ce.cid = f.cid AND ce.idx = v.idx
            GROUP BY 1, 2),
          va$r AS (
            SELECT vec_id, cell, dist2 FROM (
              SELECT vec_id, cid AS cell, dist2,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
              FROM vd$r) WHERE rn = 1)"""
    def lloydCtes(r: Int): String =
      s"""m${r + 1} AS (
            SELECT va$r.cell AS cid, v.idx,
              CAST(SUM(v.q) AS BIGINT) // COUNT(*) AS q
            FROM va$r JOIN c v ON v.vec_id = va$r.vec_id
            GROUP BY 1, 2),
          cents${r + 1} AS MATERIALIZED (
            SELECT p.cid, p.idx, COALESCE(m${r + 1}.q, p.q) AS q
            FROM cents$r p LEFT JOIN m${r + 1}
              ON m${r + 1}.cid = p.cid AND m${r + 1}.idx = p.idx)"""
    val roundsSql = (0 until rounds)
      .map(r => s"${routeCtes(r, "ct")},\n          ${lloydCtes(r)}")
      .mkString(",\n          ")
    // ss = training stride ⌈n/(64k)⌉ (integer ceil, trainStride's
    // arithmetic); ct = the systematic training sample; cents0 = the
    // first k SAMPLED vectors with cids renumbered dense via
    // vec_id // stride. Training rounds route/mean over ct only; the
    // final pass (routeCtes over c) assigns the FULL corpus.
    s"""kk AS (
          SELECT GREATEST(8, LEAST(
            CAST(CEIL(COUNT(*) / 256.0) AS BIGINT),
            4 * CAST(CEIL(SQRT(COUNT(*))) AS BIGINT),
            CAST(1048576 AS BIGINT))) AS k
          FROM embeddings),
        kcc AS (
          SELECT CAST(CEIL(SQRT(CAST(k AS DOUBLE))) AS BIGINT) AS kc FROM kk),
        ss AS (
          SELECT ((SELECT COUNT(*) FROM embeddings) + 64 * k - 1) // (64 * k)
            AS st FROM kk),
        ct AS MATERIALIZED (
          SELECT * FROM c WHERE vec_id % (SELECT st FROM ss) = 0),
        cents0 AS MATERIALIZED (
          SELECT vec_id // (SELECT st FROM ss) AS cid, idx, q FROM ct
          WHERE vec_id < (SELECT k FROM kk) * (SELECT st FROM ss)),
        $roundsSql,
        ${routeCtes(rounds, "c")},
        assigned AS MATERIALIZED (SELECT vec_id, cell, dist2 FROM va$rounds)"""
  }

  private val compsSql =
    """c AS (
         SELECT vec_id, idx - 1 AS idx,
           CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS q
         FROM (SELECT vec_id, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS idx
               FROM embeddings)),
       n AS (SELECT vec_id, sqrt(SUM(q * q)) AS norm FROM c GROUP BY 1)"""

  /** s21's oracle: the farthest-first greedy UNROLLED to k=5 steps —
    * `pd` is the all-pairs exact-integer distance table (oracle scale
    * only), `m_i` the running min-dist after i centers, `c_{i+1}` the
    * argmax with the same (md DESC, vec_id ASC) tie-break the engine
    * applies. Every value is exact int64 arithmetic on the shared
    * micro-unit quantization, so selection replays bit-equal. */
  private val coresetSql: String = {
    val k = 5
    val sb = new StringBuilder
    sb ++= s"""WITH $compsSql,
      pd AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
          SUM((a.q - b.q) * (a.q - b.q)) AS d2
        FROM c a JOIN c b ON a.idx = b.idx GROUP BY 1, 2),
      c1 AS (SELECT MIN(vec_id) AS id FROM c),
      m1 AS (SELECT va AS vec_id, d2 AS md FROM pd JOIN c1 ON pd.vb = c1.id)"""
    for (i <- 2 to k) {
      val excl = (1 until i).map(j => s"SELECT id FROM c$j")
        .mkString(" UNION ALL ")
      sb ++= s""",
      c$i AS (SELECT vec_id AS id, md FROM m${i - 1}
        WHERE vec_id NOT IN ($excl) ORDER BY md DESC, vec_id LIMIT 1)"""
      if (i < k) sb ++= s""",
      m$i AS (SELECT m.vec_id, LEAST(m.md, pd.d2) AS md
        FROM m${i - 1} m JOIN pd ON m.vec_id = pd.va
        JOIN c$i ON pd.vb = c$i.id)"""
    }
    val centRows = s"SELECT 1 AS step, id AS vec_id, CAST(0 AS BIGINT) AS dist_q FROM c1" +
      (2 to k).map(i =>
        s" UNION ALL SELECT $i, id, CAST(md AS BIGINT) FROM c$i").mkString
    sb ++= s""",
      cent AS ($centRows),
      asg AS (
        SELECT va, step FROM (
          SELECT pd.va, cent.step,
            row_number() OVER (PARTITION BY pd.va
              ORDER BY pd.d2 ASC, cent.step ASC) AS rn
          FROM pd JOIN cent ON pd.vb = cent.vec_id)
        WHERE rn = 1),
      cnt AS (SELECT step, COUNT(*) AS n_assigned FROM asg GROUP BY 1)
      SELECT cent.step, cent.vec_id, cent.dist_q, cnt.n_assigned
      FROM cent JOIN cnt USING (step) ORDER BY step"""
    sb.toString
  }

  /** s22's oracle: MMR greedy UNROLLED to k=5 — `pool` is the top-20
    * relevance cut, `ps` the pool-internal pairwise sims (both floored
    * to ppm off bit-identical IEEE divisions of exact integers), `m_i`
    * the running max-sim after i selections, `s_{i+1}` the argmax of
    * 7·rel − 3·maxsim with the engine's (score DESC, id ASC)
    * tie-break. A selected id drops out of `m_i` automatically: `ps`
    * has no self-pairs, so the inner join on ib = s_i.id excludes it. */
  private val mmrSql: String = {
    val k = 5
    val sb = new StringBuilder
    sb ++= s"""WITH $compsSql,
      da AS (
        SELECT vc.vec_id AS id, SUM(qc.q * vc.q) AS dot
        FROM c qc JOIN c vc ON qc.idx = vc.idx
        WHERE qc.vec_id = 0 AND vc.vec_id > 0 GROUP BY 1),
      rel AS (
        SELECT id,
          CAST(FLOOR(dot / (qn.norm * vn.norm) * 1000000) AS BIGINT) AS rel_ppm
        FROM da JOIN n qn ON qn.vec_id = 0 JOIN n vn ON vn.vec_id = id),
      pool AS (SELECT id, rel_ppm FROM rel ORDER BY rel_ppm DESC, id LIMIT 20),
      ps AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
          CAST(FLOOR(SUM(a.q * b.q) / (na.norm * nb.norm) * 1000000) AS BIGINT) AS sim_ppm
        FROM c a JOIN c b ON a.idx = b.idx AND a.vec_id <> b.vec_id
        JOIN pool pa ON a.vec_id = pa.id JOIN pool pb ON b.vec_id = pb.id
        JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id
        GROUP BY a.vec_id, b.vec_id, na.norm, nb.norm),
      s1 AS (SELECT id, rel_ppm FROM pool ORDER BY rel_ppm DESC, id LIMIT 1),
      m1 AS (
        SELECT p.id, p.rel_ppm, ps.sim_ppm AS ms
        FROM pool p JOIN ps ON ps.ia = p.id JOIN s1 ON ps.ib = s1.id)"""
    for (i <- 2 to k) {
      sb ++= s""",
      s$i AS (SELECT id, rel_ppm, 7 * rel_ppm - 3 * ms AS score
        FROM m${i - 1} ORDER BY score DESC, id LIMIT 1)"""
      if (i < k) sb ++= s""",
      m$i AS (
        SELECT m.id, m.rel_ppm, GREATEST(m.ms, ps.sim_ppm) AS ms
        FROM m${i - 1} m JOIN ps ON ps.ia = m.id JOIN s$i ON ps.ib = s$i.id)"""
    }
    sb ++= s"""
      SELECT 1 AS step, id, rel_ppm, 7 * rel_ppm AS score10_ppm FROM s1"""
    (2 to k).foreach(i => sb ++= s"""
      UNION ALL SELECT $i, id, rel_ppm, score FROM s$i""")
    sb ++= " ORDER BY step"
    sb.toString
  }

  /** Shared CTE chain for the LSH-bucket oracles (s2, s8, s9):
    * hyperplane weights → projections → sign-pattern bucket. */
  private val lshBucketsSql =
    """planes AS (
         SELECT j, pd, (j * 64 + pd) * 2654435761 % 97 - 48 AS w
         FROM range(6) a(j) CROSS JOIN range(64) b(pd)),
       proj AS (
         SELECT vec_id, j, SUM(q * w) AS proj
         FROM c JOIN planes ON c.idx = planes.pd GROUP BY 1, 2),
       buckets AS (
         SELECT vec_id,
           CAST(SUM(CASE WHEN proj > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1)"""

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
          $lshBucketsSql,
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
    // s20 — both arms replayed verbatim (t17's integer BM25, s1's
    // cosine), fused with the same 10⁹ // (60+rank) integer terms
    "s20_hybrid_rrf" ->
      s"""WITH $compsSql,
          dd AS (
            SELECT doc_id,
              CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS dl,
              list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
            FROM documents),
          stats AS (
            SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_toks FROM dd),
          tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
              SELECT doc_id, dl, unnest(toks) AS term FROM dd)
            WHERE term IN ('spark', 'join', 'vector')
            GROUP BY 1, 2, 3),
          df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
          bm AS (
            SELECT doc_id, CAST(SUM(cc) AS BIGINT) AS score10k FROM (
              SELECT doc_id,
                ((2*n_docs - 2*df + 1) * 22 * tf * t_toks * 10000) //
                ((2*df + 1) * (10*t_toks*tf + 3*t_toks + 9*n_docs*dl)) AS cc
              FROM tf JOIN df USING (term) CROSS JOIN stats)
            GROUP BY 1 ORDER BY score10k DESC, doc_id LIMIT 50),
          lex AS (
            SELECT doc_id AS id,
              row_number() OVER (ORDER BY score10k DESC, doc_id) AS lex_rank
            FROM bm),
          dots AS (
            SELECT vc.vec_id AS id, SUM(qc.q * vc.q) AS dot
            FROM c qc JOIN c vc ON qc.idx = vc.idx
            WHERE qc.vec_id = 0 AND vc.vec_id > 0
            GROUP BY 1),
          cosr AS (
            SELECT id, dot / (qn.norm * vn.norm) AS cos_raw
            FROM dots JOIN n qn ON qn.vec_id = 0 JOIN n vn ON vn.vec_id = id),
          sem50 AS (SELECT id, cos_raw FROM cosr ORDER BY cos_raw DESC, id LIMIT 50),
          sem AS (
            SELECT id, row_number() OVER (ORDER BY cos_raw DESC, id) AS sem_rank
            FROM sem50)
          SELECT id,
            COALESCE(lex_rank, -1) AS lex_rank,
            COALESCE(sem_rank, -1) AS sem_rank,
            COALESCE(1000000000 // (60 + lex_rank), 0) +
              COALESCE(1000000000 // (60 + sem_rank), 0) AS rrf1e9
          FROM lex FULL OUTER JOIN sem USING (id)
          ORDER BY rrf1e9 DESC, id LIMIT 20""",
    "s21_coreset" -> coresetSql,
    "s22_mmr_rerank" -> mmrSql,
    "s3_cosine_neardup" ->
      s"""WITH $compsSql,
          dots AS (
            SELECT a.vec_id AS da, b.vec_id AS db, SUM(a.q * b.q) AS dot
            FROM c a JOIN c b ON a.idx = b.idx AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
          SELECT da, db, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT da, db, dot / (na.norm * nb.norm) AS cos_raw
            FROM dots JOIN n na ON da = na.vec_id JOIN n nb ON db = nb.vec_id)
          WHERE cos_raw >= 0.45 ORDER BY da, db""",
    "s4_ivf_ann" ->
      s"""WITH $compsSql,
          dist AS (
            SELECT v.vec_id, cent.vec_id AS cid,
              SUM((v.q - cent.q) * (v.q - cent.q)) AS dist2
            FROM c v JOIN c cent ON v.idx = cent.idx AND cent.vec_id < 8
            GROUP BY 1, 2),
          assigned AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM dist)
            WHERE rn = 1),
          dots AS (
            SELECT qa.vec_id AS qid, va.vec_id AS vid, qa.cell,
              SUM(qc.q * vc.q) AS dot
            FROM assigned qa
            JOIN assigned va ON qa.cell = va.cell AND qa.vec_id < 5 AND va.vec_id >= 5
            JOIN c qc ON qc.vec_id = qa.vec_id
            JOIN c vc ON vc.vec_id = va.vec_id AND vc.idx = qc.idx
            GROUP BY 1, 2, 3),
          cos AS (
            SELECT qid, vid, cell, dot / (qn.norm * vn.norm) AS cos_raw
            FROM dots JOIN n qn ON qid = qn.vec_id JOIN n vn ON vid = vn.vec_id)
          SELECT qid, cell, vid, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT qid, vid, cell, cos_raw,
              row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rank
            FROM cos)
          WHERE rank = 1 ORDER BY qid""",
    // s18 — the shared Lloyd+routing prefix (ivfRoutedSql) assigns
    // every vector its routed cell; candidates (label ≤ 3, non-query)
    // read theirs from `assigned`, queries rank the LEARNED cents2
    // flat and keep their autoProbeCells nearest cells (integer-ceil
    // ⌈n/nf⌉ clamped to [2, k], computed in the sel CTE by the same
    // arithmetic); join on cell, exact cosine, top-3. The label
    // predicate sits on the candidate side only — pre-filtering, not
    // post-filtering.
    "s18_filtered_ann" ->
      s"""WITH $compsSql,
          ${ivfRoutedSql(2)},
          sel AS (
            SELECT GREATEST(2, LEAST((SELECT k FROM kk),
              (COUNT(*) + SUM(CASE WHEN label <= 3 AND vec_id >= 5 THEN 1 ELSE 0 END) - 1)
                // SUM(CASE WHEN label <= 3 AND vec_id >= 5 THEN 1 ELSE 0 END))) AS p
            FROM embeddings),
          cand AS (
            SELECT a.vec_id, a.cell, e.label
            FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
            WHERE e.label <= 3 AND a.vec_id >= 5),
          qd AS (
            SELECT v.vec_id, ce.cid,
              SUM((v.q - ce.q) * (v.q - ce.q)) AS dist2
            FROM c v JOIN cents2 ce ON v.idx = ce.idx
            WHERE v.vec_id < 5
            GROUP BY 1, 2),
          probes AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
              FROM qd) CROSS JOIN sel
            WHERE rn <= p),
          dots AS (
            SELECT p.vec_id AS qid, cand.vec_id AS vid, cand.label, cand.cell,
              SUM(qc.q * vc.q) AS dot
            FROM probes p JOIN cand ON p.cell = cand.cell
            JOIN c qc ON qc.vec_id = p.vec_id
            JOIN c vc ON vc.vec_id = cand.vec_id AND vc.idx = qc.idx
            GROUP BY 1, 2, 3, 4),
          cos AS (
            SELECT qid, vid, label, cell, dot / (qn.norm * vn.norm) AS cos_raw
            FROM dots JOIN n qn ON qid = qn.vec_id JOIN n vn ON vid = vn.vec_id)
          SELECT qid, rank, vid, label, cell, ROUND(cos_raw, 4) AS cosine FROM (
            SELECT qid, vid, label, cell, cos_raw,
              row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rank
            FROM cos)
          WHERE rank <= 3 ORDER BY qid, rank""",
    // s19 — the full Lloyd+routing trajectory replayed relationally;
    // occupancy and exact integer inertia per routed cell
    "s19_ivf_lloyd" ->
      s"""WITH $compsSql,
          ${ivfRoutedSql(2)}
          SELECT cell, COUNT(*) AS n_assigned,
            CAST(SUM(dist2) AS BIGINT) AS inertia
          FROM assigned GROUP BY 1 ORDER BY cell""",
    // s17 — the shared Lloyd+routing prefix (ENGINE-SIZED k and kc,
    // computed by the same max(8, ceil(N/256)) / ceil(sqrt(k)) rules
    // in SQL; 2 Lloyd rounds replayed as CTE chains) + within-cell
    // cosine pairs + d5's recursive-reachability CC, re-keyed to
    // vectors; singletons kept via the LEFT join (own id is the rep)
    "s17_semdedup" ->
      s"""WITH RECURSIVE $compsSql,
          ${ivfRoutedSql(2)},
          dots AS (
            SELECT a.vec_id AS da, b.vec_id AS db, SUM(ca.q * cb.q) AS dot
            FROM assigned a
            JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN c ca ON ca.vec_id = a.vec_id
            JOIN c cb ON cb.vec_id = b.vec_id AND cb.idx = ca.idx
            GROUP BY 1, 2),
          prs AS (
            SELECT da, db FROM dots
            JOIN n na ON da = na.vec_id JOIN n nb ON db = nb.vec_id
            WHERE dot / (na.norm * nb.norm) >= 0.40),
          edges AS (
            SELECT da AS a, b FROM (SELECT da, db AS b FROM prs)
            UNION SELECT db, da FROM prs),
          nodesx AS (SELECT DISTINCT a AS v FROM edges),
          reach(v, r) AS (
            SELECT v, v FROM nodesx
            UNION
            SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
          reps AS (SELECT v AS vec_id, MIN(r) AS rep FROM reach GROUP BY 1)
          SELECT a.vec_id, a.cell,
            COALESCE(reps.rep, a.vec_id) AS rep_id,
            (COALESCE(reps.rep, a.vec_id) = a.vec_id) AS is_kept
          FROM assigned a LEFT JOIN reps ON reps.vec_id = a.vec_id
          ORDER BY a.vec_id""",
    // division chain must mirror Spark's exactly: (double sum / n) / 1e6
    "s5_label_centroids" ->
      """SELECT label, idx - 1 AS dim,
           ROUND(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) * 1.0
             / COUNT(*) / 1000000, 6) AS centroid
         FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS idx
               FROM embeddings)
         GROUP BY 1, 2 ORDER BY label, dim""",
    "s7_knn_label" ->
      s"""WITH $compsSql,
          dots AS (
            SELECT qc.vec_id AS qid, vc.vec_id AS vid, SUM(qc.q * vc.q) AS dot
            FROM c qc JOIN c vc ON qc.idx = vc.idx
            WHERE qc.vec_id < 5 AND vc.vec_id >= 5
            GROUP BY 1, 2),
          topk AS (
            SELECT qid, vid FROM (
              SELECT qid, vid,
                row_number() OVER (PARTITION BY qid
                  ORDER BY dot / (qn.norm * vn.norm) DESC, vid ASC) AS rank
              FROM dots JOIN n qn ON qid = qn.vec_id JOIN n vn ON vid = vn.vec_id)
            WHERE rank <= 10),
          votes AS (
            SELECT qid, label, COUNT(*) AS votes
            FROM topk JOIN embeddings e ON topk.vid = e.vec_id
            GROUP BY 1, 2)
          SELECT qid, label AS pred_label, votes FROM (
            SELECT qid, label, votes,
              row_number() OVER (PARTITION BY qid
                ORDER BY votes DESC, label ASC) AS rn
            FROM votes)
          WHERE rn = 1 ORDER BY qid""",
    "s6_vector_stats" ->
      """WITH comps AS (
           SELECT vec_id, CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS q
           FROM (SELECT vec_id, unnest(embedding) AS v
                 FROM embeddings WHERE vec_id < 100)),
         agg AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS l2sq FROM comps GROUP BY 1)
         SELECT e.vec_id, CAST(len(embedding) AS INT) AS dim, a.l2sq,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS min_c,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_c
         FROM embeddings e JOIN agg a ON e.vec_id = a.vec_id
         WHERE e.vec_id < 100
         ORDER BY e.vec_id""",
    // s8 = s2's bucket CTEs → thresholded pairs → recursive-CTE CC →
    // per-cluster count + representative label (same reach() shape as
    // the d5/d8 oracles)
    "s8_semantic_clusters" ->
      s"""WITH RECURSIVE $compsSql,
          $lshBucketsSql,
          cand AS (
            SELECT a.vec_id AS da, b.vec_id AS db
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
          dots AS (
            SELECT da, db, SUM(ac.q * bc.q) AS dot
            FROM cand JOIN c ac ON da = ac.vec_id
            JOIN c bc ON db = bc.vec_id AND ac.idx = bc.idx
            GROUP BY 1, 2),
          pairs AS (
            SELECT da, db FROM dots
            JOIN n na ON da = na.vec_id JOIN n nb ON db = nb.vec_id
            WHERE dot / (na.norm * nb.norm) >= 0.40),
          edges AS (
            SELECT da AS ea, db AS eb FROM pairs
            UNION SELECT db, da FROM pairs),
          nodes AS (SELECT DISTINCT ea AS vec_id FROM edges),
          reach(vec_id, r) AS (
            SELECT vec_id, vec_id FROM nodes
            UNION
            SELECT reach.vec_id, e.eb FROM reach JOIN edges e ON reach.r = e.ea),
          cc AS (SELECT vec_id, MIN(r) AS cluster_id FROM reach GROUP BY 1)
          SELECT cluster_id AS rep_vec_id, n_members, label
          FROM (SELECT cluster_id, COUNT(*) AS n_members FROM cc GROUP BY 1)
          JOIN embeddings ON cluster_id = vec_id
          ORDER BY rep_vec_id""",
    // s9 = brute top-1 (exact dots over the query sample × corpus)
    // LEFT JOIN lsh top-1 (bucket-restricted), counted into one row;
    // a query with an empty bucket has no lsh row → NULL ≠ bvid → miss
    "s9_ann_recall" ->
      s"""WITH $compsSql,
          $lshBucketsSql,
          bdots AS (
            SELECT qc.vec_id AS qid, vc.vec_id AS vid, SUM(qc.q * vc.q) AS dot
            FROM c qc JOIN c vc ON qc.idx = vc.idx AND qc.vec_id <> vc.vec_id
            WHERE qc.vec_id < 50
            GROUP BY 1, 2),
          bcos AS (
            SELECT qid, vid, dot / (nq.norm * nv.norm) AS cos_raw
            FROM bdots JOIN n nq ON qid = nq.vec_id JOIN n nv ON vid = nv.vec_id),
          brute AS (
            SELECT qid, vid AS bvid FROM (
              SELECT qid, vid, row_number() OVER
                (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rk
              FROM bcos) WHERE rk = 1),
          lcand AS (
            SELECT a.vec_id AS qid, b.vec_id AS vid
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
            WHERE a.vec_id < 50),
          ldots AS (
            SELECT qid, vid, SUM(ac.q * bc.q) AS dot
            FROM lcand JOIN c ac ON qid = ac.vec_id
            JOIN c bc ON vid = bc.vec_id AND ac.idx = bc.idx
            GROUP BY 1, 2),
          lcos AS (
            SELECT qid, vid, dot / (nq.norm * nv.norm) AS cos_raw
            FROM ldots JOIN n nq ON qid = nq.vec_id JOIN n nv ON vid = nv.vec_id),
          lsh AS (
            SELECT qid, vid AS lvid FROM (
              SELECT qid, vid, row_number() OVER
                (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rk
              FROM lcos) WHERE rk = 1),
          mcand AS (
            SELECT a.vec_id AS qid, b.vec_id AS vid
            FROM buckets a JOIN buckets b
              ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id <> b.vec_id
            WHERE a.vec_id < 50),
          mdots AS (
            SELECT qid, vid, SUM(ac.q * bc.q) AS dot
            FROM mcand JOIN c ac ON qid = ac.vec_id
            JOIN c bc ON vid = bc.vec_id AND ac.idx = bc.idx
            GROUP BY 1, 2),
          mcos AS (
            SELECT qid, vid, dot / (nq.norm * nv.norm) AS cos_raw
            FROM mdots JOIN n nq ON qid = nq.vec_id JOIN n nv ON vid = nv.vec_id),
          mlsh AS (
            SELECT qid, vid AS mvid FROM (
              SELECT qid, vid, row_number() OVER
                (PARTITION BY qid ORDER BY cos_raw DESC, vid ASC) AS rk
              FROM mcos) WHERE rk = 1)
          SELECT COUNT(*) AS n_queries,
            CAST(SUM(CASE WHEN lvid = bvid THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_1probe,
            ROUND(CAST(SUM(CASE WHEN lvid = bvid THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*), 4) AS recall_1probe,
            CAST(SUM(CASE WHEN mvid = bvid THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_multiprobe,
            ROUND(CAST(SUM(CASE WHEN mvid = bvid THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*), 4) AS recall_multiprobe
          FROM brute LEFT JOIN lsh USING (qid) LEFT JOIN mlsh USING (qid)""",
    // s10 — exploded-component spelling of the same exact integer
    // arithmetic: (x−c)·(x−c) summed per (vector, subspace, centroid)
    "s10_pq_codes" ->
      s"""WITH $compsSql,
          parts AS (
            SELECT vec_id, idx // 8 AS m, idx % 8 AS j, q FROM c),
          cents AS (
            SELECT vec_id AS k, m, j, q AS cq FROM parts WHERE vec_id < 4),
          dists AS (
            SELECT p.vec_id, p.m, ce.k,
              SUM((p.q - ce.cq) * (p.q - ce.cq)) AS dist2
            FROM parts p JOIN cents ce ON p.m = ce.m AND p.j = ce.j
            GROUP BY 1, 2, 3),
          best AS (
            SELECT vec_id, m, k, dist2 FROM (
              SELECT vec_id, m, k, dist2,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist2, k) AS rk
              FROM dists) WHERE rk = 1)
          SELECT vec_id,
            CAST(SUM(k * (CAST(1 AS BIGINT) << (2 * m))) AS BIGINT) AS pq_code,
            CAST(SUM(dist2) AS BIGINT) AS recon_err
          FROM best GROUP BY 1 ORDER BY vec_id""",
    // s11 — same parts/cents/dists chain; ADC = per-(query, target)
    // sum of the query's table entries at the target's code digits
    "s11_pq_adc_topk" ->
      s"""WITH $compsSql,
          parts AS (
            SELECT vec_id, idx // 8 AS m, idx % 8 AS j, q FROM c),
          cents AS (
            SELECT vec_id AS k, m, j, q AS cq FROM parts WHERE vec_id < 4),
          dists AS (
            SELECT p.vec_id, p.m, ce.k,
              SUM((p.q - ce.cq) * (p.q - ce.cq)) AS dist2
            FROM parts p JOIN cents ce ON p.m = ce.m AND p.j = ce.j
            GROUP BY 1, 2, 3),
          best AS (
            SELECT vec_id, m, k FROM (
              SELECT vec_id, m, k,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist2, k) AS rk
              FROM dists) WHERE rk = 1),
          adc AS (
            SELECT qd.vec_id AS qid, b.vec_id AS vid,
              CAST(SUM(qd.dist2) AS BIGINT) AS adist
            FROM best b JOIN dists qd ON b.m = qd.m AND b.k = qd.k
            WHERE b.vec_id >= 5 AND qd.vec_id < 5
            GROUP BY 1, 2)
          SELECT qid, rank, vid, adist FROM (
            SELECT qid, vid, adist,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vid) AS rank
            FROM adc)
          WHERE rank <= 5 ORDER BY qid, rank""",
    // s16 — s4's cell CTEs + s11's PQ chain, ADC restricted to
    // cell-mates of each query (the IVF gate in relational form)
    "s16_ivfpq_topk" ->
      s"""WITH $compsSql,
          cdist AS (
            SELECT v.vec_id, cent.vec_id AS cid,
              SUM((v.q - cent.q) * (v.q - cent.q)) AS dist2
            FROM c v JOIN c cent ON v.idx = cent.idx AND cent.vec_id < 8
            GROUP BY 1, 2),
          assigned AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
              FROM cdist)
            WHERE rn = 1),
          parts AS (
            SELECT vec_id, idx // 8 AS m, idx % 8 AS j, q FROM c),
          cents AS (
            SELECT vec_id AS k, m, j, q AS cq FROM parts WHERE vec_id < 4),
          dists AS (
            SELECT p.vec_id, p.m, ce.k,
              SUM((p.q - ce.cq) * (p.q - ce.cq)) AS dist2
            FROM parts p JOIN cents ce ON p.m = ce.m AND p.j = ce.j
            GROUP BY 1, 2, 3),
          best AS (
            SELECT vec_id, m, k FROM (
              SELECT vec_id, m, k,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist2, k) AS rk
              FROM dists) WHERE rk = 1),
          adc AS (
            SELECT qa.vec_id AS qid, b.vec_id AS vid, qa.cell,
              CAST(SUM(qd.dist2) AS BIGINT) AS adist
            FROM best b
            JOIN assigned va ON va.vec_id = b.vec_id
            JOIN assigned qa ON qa.cell = va.cell AND qa.vec_id < 5
            JOIN dists qd ON b.m = qd.m AND b.k = qd.k AND qd.vec_id = qa.vec_id
            WHERE b.vec_id >= 5
            GROUP BY 1, 2, 3)
          SELECT qid, rank, vid, adist, cell FROM (
            SELECT qid, vid, cell, adist,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vid) AS rank
            FROM adc)
          WHERE rank <= 3 ORDER BY qid, rank""",
    // s12 — relational replay of the scalar quantizer: per-dim bounds,
    // the same integer floor-division nearest-level rounding, ×255
    // integer residuals. All-BIGINT, so order of summation is free.
    "s12_sq_codes" ->
      s"""WITH $compsSql,
          b AS (SELECT idx, MIN(q) AS mn, MAX(q) AS mx FROM c GROUP BY 1),
          q1 AS (
            SELECT c.vec_id, c.idx, c.q, b.mn, b.mx,
              CASE WHEN mx = mn THEN 0
                   ELSE CAST(((q - mn) * 510 + (mx - mn)) // (2 * (mx - mn)) AS INT)
              END AS code
            FROM c JOIN b USING (idx)),
          e AS (
            SELECT vec_id, idx, code,
              (q - mn) * 255 - CAST(code AS BIGINT) * (mx - mn) AS err
            FROM q1)
          SELECT vec_id,
            array_to_string(list(code ORDER BY idx), ',') AS codes,
            CAST(SUM(err * err) AS BIGINT) AS recon_err
          FROM e GROUP BY 1 ORDER BY vec_id""",
    "s13_kmeans_assign" ->
      s"""WITH $compsSql,
          seeds AS (SELECT vec_id AS sid, idx, q FROM c WHERE vec_id < 8),
          dist AS (
            SELECT c.vec_id AS vid, s.sid,
              SUM((c.q - s.q) * (c.q - s.q)) AS d2
            FROM c JOIN seeds s ON c.idx = s.idx
            GROUP BY 1, 2),
          best AS (
            SELECT vid, sid, d2 FROM (
              SELECT vid, sid, d2,
                row_number() OVER (PARTITION BY vid ORDER BY d2, sid) AS rn
              FROM dist)
            WHERE rn = 1)
          SELECT sid AS centroid_id, COUNT(*) AS n_assigned,
            CAST(SUM(d2) AS BIGINT) AS inertia,
            CAST(SUM(d2) // COUNT(*) AS BIGINT) AS mean_dist
          FROM best GROUP BY 1 ORDER BY centroid_id""",

    // s15 — brute-force pair scan with the truncated dots as
    // conditional sums over the SAME unnested components; cosine
    // doubles come from identical exact integers on both engines
    // (s9's proven determinism bargain), ties break by vid
    "s15_matryoshka_recall" ->
      s"""WITH $compsSql,
         n16 AS (SELECT vec_id, sqrt(SUM(q * q)) AS nrm FROM c
                 WHERE idx < 16 GROUP BY 1),
         n32 AS (SELECT vec_id, sqrt(SUM(q * q)) AS nrm FROM c
                 WHERE idx < 32 GROUP BY 1),
         d AS (
           SELECT a.vec_id AS qid, b.vec_id AS vid,
             CAST(SUM(a.q * b.q) AS DOUBLE) AS dot64,
             CAST(SUM(CASE WHEN a.idx < 16 THEN a.q * b.q ELSE 0 END) AS DOUBLE)
               AS dot16,
             CAST(SUM(CASE WHEN a.idx < 32 THEN a.q * b.q ELSE 0 END) AS DOUBLE)
               AS dot32
           FROM c a JOIN c b ON a.idx = b.idx
           WHERE a.vec_id < 50 AND a.vec_id <> b.vec_id
           GROUP BY 1, 2),
         cosd AS (
           SELECT d.qid, d.vid,
             dot64 / (na.norm * nb.norm) AS cos64,
             dot16 / (na16.nrm * nb16.nrm) AS cos16,
             dot32 / (na32.nrm * nb32.nrm) AS cos32
           FROM d
           JOIN n na ON na.vec_id = d.qid JOIN n nb ON nb.vec_id = d.vid
           JOIN n16 na16 ON na16.vec_id = d.qid JOIN n16 nb16 ON nb16.vec_id = d.vid
           JOIN n32 na32 ON na32.vec_id = d.qid JOIN n32 nb32 ON nb32.vec_id = d.vid),
         best AS (
           SELECT qid,
             (MIN(struct_pack(a := -cos64, v := vid))).v AS fvid,
             (MIN(struct_pack(a := -cos16, v := vid))).v AS v16,
             (MIN(struct_pack(a := -cos32, v := vid))).v AS v32
           FROM cosd GROUP BY qid)
         SELECT COUNT(*) AS n_queries,
           CAST(SUM(CASE WHEN v16 = fvid THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_16,
           ROUND(SUM(CASE WHEN v16 = fvid THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS recall_16,
           CAST(SUM(CASE WHEN v32 = fvid THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_32,
           ROUND(SUM(CASE WHEN v32 = fvid THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS recall_32
         FROM best""",

    // s14 — the exact integer trajectory replayed relationally: the
    // in-row array dots become per-dimension joins (the SEMANTICS,
    // not the plan); `//` mirrors Spark DIV (both truncate toward 0)
    "s14_pca_power" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xm
           FROM embeddings),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
         ex AS (
           SELECT vec_id, generate_subscripts(xm, 1) - 1 AS dim, unnest(xm) AS x
           FROM e),
         d0 AS (SELECT vec_id, CAST(list_sum(xm) AS BIGINT) AS dot0 FROM e),
         w1 AS (
           SELECT dim, CAST(SUM(x * dot0) AS BIGINT) AS w1
           FROM ex JOIN d0 USING (vec_id) GROUP BY dim),
         v1 AS (
           SELECT dim, CAST(w1 // (n * 64) AS BIGINT) AS v1
           FROM w1 CROSS JOIN nn),
         d1 AS (
           SELECT vec_id, CAST(CAST(SUM(x * v1) AS BIGINT) // 1024 AS BIGINT) AS t1
           FROM ex JOIN v1 USING (dim) GROUP BY vec_id),
         w2 AS (
           SELECT dim, CAST(SUM(x * t1) AS BIGINT) AS w2
           FROM ex JOIN d1 USING (vec_id) GROUP BY dim)
         SELECT CAST(v1.dim AS INT) AS dim, v1.v1,
           CAST(w2 // n AS BIGINT) AS v2
         FROM v1 JOIN w2 USING (dim) CROSS JOIN nn
         ORDER BY dim"""
  )
}
