package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries

/** Pins for the ENGINE-SIZED LSH index (r10 verdict ask #1): the
  * frozen-plane index is a measured quadratic wall (SCALE.md r10 —
  * in-bucket candidates ×98 at 10× with planes pinned at 6), so plane
  * selection must be engine behavior, not a caller-supplied constant.
  *
  *  - the sizing rule itself: planes = max(floor, ⌈log₂(N/occupancy)⌉)
  *    at the exact corpus sizes the engine meets (shipped SFs resolve
  *    to the floor — the pinned DuckDB oracle is unchanged by
  *    construction; the 10× probe corpus resolves to 10 — the measured
  *    ~5.9× scale path), plus monotonicity and the power-of-two
  *    boundaries where the double log2 must stay exact;
  *  - auto == fixed at the floor: semanticClustersAuto on a shipped SF
  *    is row-identical to semanticClusters(nPlanes = 6) — the oracle
  *    gate and this identity together prove the auto path changes
  *    nothing until the corpus actually grows.
  */
class SimilaritySizingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("autoPlanes: occupancy rule at the engine's own corpus sizes") {
    // shipped SFs: 500 (sf0.001/sf0.01) and 2000 (sf0.1) vectors ÷ 32
    // occupancy stay under 2^6 → the floor; the ScaleProbe 10× corpus
    // (20000) needs ⌈log₂(625)⌉ = 10 — exactly the r10 log-planes path
    assert(SimilarityQueries.autoPlanes(500) == 6)
    assert(SimilarityQueries.autoPlanes(2000) == 6)
    assert(SimilarityQueries.autoPlanes(20000) == 10)
    // a 100× corpus: ⌈log₂(200000/32)⌉ = ⌈12.6⌉ = 13
    assert(SimilarityQueries.autoPlanes(200000) == 13)
  }

  test("autoPlanes: power-of-two boundaries are exact, not off-by-one") {
    // N/occ = 2^k exactly ⇒ planes = k (ceil of an exact double log2);
    // one vector more ⇒ k+1
    assert(SimilarityQueries.autoPlanes(32L << 10) == 10) // 32768/32 = 2^10
    assert(SimilarityQueries.autoPlanes((32L << 10) + 1) == 11)
    assert(SimilarityQueries.autoPlanes(32L << 20) == 20)
    assert(SimilarityQueries.autoPlanes((32L << 20) + 1) == 21)
  }

  test("autoPlanes: floor below/at occupancy, monotone in N, occupancy knob") {
    assert(SimilarityQueries.autoPlanes(0) == 6)
    assert(SimilarityQueries.autoPlanes(1) == 6)
    assert(SimilarityQueries.autoPlanes(32) == 6)
    val widths = (1L to 20L).map(k => SimilarityQueries.autoPlanes(1L << k))
    assert(widths == widths.sorted, s"not monotone: $widths")
    // halving the target occupancy adds exactly one plane past the floor
    assert(SimilarityQueries.autoPlanes(20000, targetOccupancy = 16) == 11)
    intercept[IllegalArgumentException] {
      SimilarityQueries.autoPlanes(100, targetOccupancy = 0)
    }
  }

  test("autoProbeRadius: depth grows one bit per 4 extra planes; " +
    "deeper probing never loses recall (monotone by construction)") {
    assert(SimilarityQueries.autoProbeRadius(6) == 1) // the floor keeps Hamming-1
    assert(SimilarityQueries.autoProbeRadius(10) == 2) // the 10x auto width
    assert(SimilarityQueries.autoProbeRadius(13) == 3)
    assert(SimilarityQueries.autoProbeRadius(17) == 4)
    // probe sets nest (radius-2 masks ⊇ radius-1 masks), so measured
    // recall at the wider radius can only match or improve — checked
    // on real data at a widened index
    val h1 = SimilarityQueries.annRecall(spark, sf, nPlanes = 10, probeRadius = 1)
      .collect().head
    val h2 = SimilarityQueries.annRecall(spark, sf, nPlanes = 10, probeRadius = 2)
      .collect().head
    assert(h2.getAs[Double]("recall_multiprobe") >=
      h1.getAs[Double]("recall_multiprobe"))
    // and the single-probe column is radius-independent
    assert(h2.getAs[Double]("recall_1probe") == h1.getAs[Double]("recall_1probe"))
  }

  test("autoCells (s17's IVF axis): occupancy rule, floor at shipped SFs, " +
    "caps past the deployment band (r12 verdict ask #2)") {
    // shipped SFs resolve to the floor — the pinned s17 oracle's SQL
    // computes the same k, so both sides stay at 8 cells
    assert(SimilarityQueries.autoCells(500) == 8)
    assert(SimilarityQueries.autoCells(2000) == 8)
    assert(SimilarityQueries.autoCells(2048) == 8)
    assert(SimilarityQueries.autoCells(2049) == 9)
    assert(SimilarityQueries.autoCells(20000) == 79) // the 10x probe corpus
    // the √N cap binds only past N = 2^20 (occ = 4·√N exactly there),
    // so every shipped SF and the probe corpus sit on the occupancy
    // rule — unchanged k ⇒ unchanged oracles
    assert(SimilarityQueries.autoCells(1L << 20) == 4096)
    assert(SimilarityQueries.autoCells(10000000L) == 12652)  // 4·⌈√N⌉ < ⌈N/256⌉
    assert(SimilarityQueries.autoCells(1000000000L) == 126492)
    // the absolute 2^20 ceiling binds past N = 2^36: k — and the
    // 64·k-vector training sample — become CONSTANT
    assert(SimilarityQueries.autoCells(1L << 36) == (1L << 20))
    assert(SimilarityQueries.autoCells(1L << 40) == (1L << 20))
    val ks = (1L to 40L).map(k => SimilarityQueries.autoCells(1L << k))
    assert(ks == ks.sorted)
    intercept[IllegalArgumentException] {
      SimilarityQueries.autoCells(100, targetOccupancy = 0)
    }
  }

  test("capped k bounds the Lloyd training input sublinearly, then constant") {
    import graft.operators.IvfIndex.trainStride
    def trainingInput(n: Long): Long = n / trainStride(n, SimilarityQueries.autoCells(n))
    // occupancy regime: a fixed quarter of the corpus (stride 4)
    assert(trainingInput(1L << 18) == (1L << 16))
    // √N-cap regime: training ≈ 64·4·√N — the N-fraction falls with N
    val atCap = trainingInput(1L << 30)
    assert(atCap < (1L << 30) / 100,
      s"training input past the √N cap must be a vanishing fraction, got $atCap")
    // absolute-ceiling regime: training input pinned at ~64·2^20
    val ceilA = trainingInput(1L << 37)
    val ceilB = trainingInput(1L << 40)
    assert(ceilA <= 68000000L && ceilB <= 68000000L,
      s"training input past k-max must be ~constant 64·2^20, got $ceilA / $ceilB")
  }

  test("autoMinhashRows (d3's band-width axis): floor at shipped SFs, " +
    "log2 widening past the divisor, monotone (r13)") {
    import graft.operators.DedupQueries.autoMinhashRows
    // both shipped SFs (500 / 5,000 docs) sit on the floor — the
    // pinned d3 oracle keeps its 4x2 banding
    assert(autoMinhashRows(500) == 2)
    assert(autoMinhashRows(1280) == 2)
    assert(autoMinhashRows(5000) == 2)   // ceil(log2(3.906)) = 2
    assert(autoMinhashRows(5120) == 2)   // exact power-of-two boundary
    assert(autoMinhashRows(5121) == 3)
    assert(autoMinhashRows(20000) == 4)  // the 10x probe corpus
    assert(autoMinhashRows(80000) == 6)  // the 40x probe corpus
    assert(autoMinhashRows(1L << 20) == 10)
    val rs = (1L to 40L).map(k => autoMinhashRows(1L << k))
    assert(rs == rs.sorted)
    intercept[IllegalArgumentException] { autoMinhashRows(100, target = 0) }
  }

  test("minhash auto == fixed 4x2 at shipped scale: the pinned d3 oracle " +
    "is untouched") {
    import graft.operators.DedupQueries
    val auto = SparkEntry.queries("d3_minhash_lsh")(spark, sf)
      .collect().map(_.toSeq).toSet
    val sh = DedupQueries.shinglesOf(
      graft.sources.Tables.load(spark, sf, "documents")).localCheckpoint(true)
    val fixed = DedupQueries.minhashPairsAt(sh, 2)
      .collect().map(_.toSeq).toSet
    assert(auto == fixed, "shipped-SF geometry must be the pre-r13 4x2 banding")
    assert(auto.nonEmpty)
  }

  test("autoProbeCells (s18's probe axis): ceil-of-inverse-selectivity, " +
    "floor 2, cap at the cell count") {
    import graft.operators.SimilarityQueries.autoProbeCells
    assert(autoProbeCells(500, 200, 8) == 3)  // ~40% selectivity -> 3 probes
    assert(autoProbeCells(500, 250, 8) == 2)  // exactly 2.0 stays 2 (integer ceil)
    assert(autoProbeCells(500, 251, 8) == 2)  // 1.99 floors at 2
    assert(autoProbeCells(500, 499, 8) == 2)  // non-selective filter: floor holds
    assert(autoProbeCells(500, 10, 8) == 8)   // 2% selectivity: scan all cells
    // monotone: tighter filters never get FEWER probes
    val ps = (1L to 500L).map(nf => autoProbeCells(500, nf, 8))
    assert(ps == ps.sorted.reverse)
    intercept[IllegalArgumentException] { autoProbeCells(500, 0, 8) }
  }

  test("auto == fixed-6 at shipped scale: the pinned oracle is untouched") {
    val auto = SimilarityQueries.semanticClustersAuto(spark, sf).collect().toSeq
    val fixed = SimilarityQueries.semanticClusters(spark, sf, nPlanes = 6)
      .collect().toSeq
    assert(auto == fixed)
    assert(auto.nonEmpty)
  }
}
