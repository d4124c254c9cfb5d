package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
  * HLL small-range linear-counting correction) as a native Catalyst
  * aggregate.
  *
  * Why a sketch at 100 TB: exact `COUNT(DISTINCT)` shuffles every
  * distinct key; the sketch is a fixed 2^p-byte buffer per group that
  * partial-aggregates map-side and merges register-wise — the shuffle
  * carries kilobytes per group regardless of cardinality, and sketches
  * from different days/partitions union losslessly (max is
  * associative, commutative, idempotent), so rollups never rescan.
  *
  * Spark ships `approx_count_distinct` (HLL++); this exists for the
  * part that builtin doesn't expose: the sketch itself as a mergeable
  * value under our control (stable across Spark versions, replayable
  * in any engine that implements the same register math — the
  * fixed-seed hash keeps estimates bit-deterministic everywhere).
  *
  * Estimator: E = α_m · m² / Σ 2^(−reg_j); below 2.5m with empty
  * registers it switches to linear counting m·ln(m/V). Hash is a
  * 64-bit finalizer (splitmix64 constants) over the value's canonical
  * bytes — deterministic, avalanching, engine-independent.
  */
object Hll {

  /** splitmix64 finalizer — full-avalanche 64→64 bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    z
  }

  /** FNV-1a 64-bit over raw bytes (strings), then mixed. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001B3L; i += 1 }
    mix64(h)
  }

  /** Fold one hashed value into the register file. */
  def add(regs: Array[Byte], p: Int, h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Register-wise max — the lossless sketch union. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Cardinality estimate with the small-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -regs(i)) // 2^-reg exactly
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    val e = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    math.rint(e).toLong
  }
}

/** `hll_distinct(v [, p]) -> BIGINT` — approximate COUNT(DISTINCT v)
  * via a 2^p-register HyperLogLog sketch (default p=12: ±1.6% typical
  * error, 4 KiB per group). Supports integral and string inputs. */
case class HllDistinct(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  // reject unsupported types at ANALYSIS, like every builtin — the
  // lazy hashOf otherwise first forces on an executor, failing the
  // query mid-stage after task retries
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_distinct supports BIGINT/INT/STRING inputs, got ${dt.sql}")
    }

  private lazy val hashOf: Any => Long = child.dataType match {
    case LongType    => v => Hll.mix64(v.asInstanceOf[Long])
    case IntegerType => v => Hll.mix64(v.asInstanceOf[Int].toLong)
    case StringType  => v => Hll.hashBytes(v.asInstanceOf[UTF8String].getBytes)
    case dt => throw new IllegalArgumentException(
      s"hll_distinct supports BIGINT/INT/STRING inputs, got $dt")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buffer, p, hashOf(v))
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(buffer, other)

  override def eval(buffer: Array[Byte]): Any = Hll.estimate(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

/** `hll_sketch(v [, p]) -> BINARY` — the register file itself, not the
  * estimate: the mergeable artifact a 100 TB rollup actually stores.
  * Sketch once per fine slice (day × type × source), persist the 2^p-
  * byte blob, answer ANY coarser distinct-count by `hll_merge` +
  * `hll_estimate` without rescanning the fact table. Same fixed-seed
  * hash as [[HllDistinct]], so `hll_estimate(hll_sketch(v)) ==
  * hll_distinct(v)` bit-for-bit. */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll precision must be in [4, 16], got $p")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_sketch supports BIGINT/INT/STRING inputs, got ${dt.sql}")
    }

  private lazy val hashOf: Any => Long = child.dataType match {
    case LongType    => v => Hll.mix64(v.asInstanceOf[Long])
    case IntegerType => v => Hll.mix64(v.asInstanceOf[Int].toLong)
    case StringType  => v => Hll.hashBytes(v.asInstanceOf[UTF8String].getBytes)
    case dt => throw new IllegalArgumentException(
      s"hll_sketch supports BIGINT/INT/STRING inputs, got $dt")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buffer, p, hashOf(v))
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(buffer, other)

  // defensive copy: eval must not alias the mutable buffer
  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** `hll_merge(sketch) -> BINARY` — register-wise max over stored
  * sketch blobs: the re-aggregation half of the rollup (lossless:
  * max is associative/commutative/idempotent, so merge order and
  * partitioning never change the result). Inputs must share one
  * precision; a width mismatch fails loudly rather than estimating
  * garbage. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_merge takes an hll_sketch BINARY column, got ${dt.sql}")
    }

  // empty buffer = identity element; sized lazily from the first
  // sketch seen so the merge works at any precision without a p arg
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeInto(buffer: Array[Byte], sk: Array[Byte]): Array[Byte] =
    if (buffer.isEmpty) sk.clone()
    else if (sk.isEmpty) buffer
    else if (sk.length != buffer.length)
      throw new IllegalArgumentException(
        s"hll_merge: mixed sketch widths ${buffer.length} vs ${sk.length}")
    else Hll.merge(buffer, sk)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] =
    child.eval(input) match {
      case null            => buffer
      case b: Array[Byte]  => mergeInto(buffer, b)
      case other => throw new IllegalArgumentException(
        s"hll_merge expects BINARY sketches, got: $other")
    }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `hll_estimate(sketch) -> BIGINT` — scalar cardinality estimate of a
  * stored/merged sketch blob; inlines into whole-stage codegen. */
case class HllEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_estimate takes an hll_sketch BINARY column, got ${dt.sql}")
    }

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val h = Hll.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$h.estimate($c)")
  }

  override def prettyName: String = "hll_estimate"
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllSketch {
  /** Column API: `hll_distinct(col)` / `hll_distinct(col, p)`. */
  def hll_distinct(c: Column, p: Int = 12): Column =
    Bridge.column(HllDistinct(Bridge.expression(c), p).toAggregateExpression())

  /** Column API: `hll_sketch(col [, p])` — mergeable sketch blob. */
  def hll_sketch(c: Column, p: Int = 12): Column =
    Bridge.column(HllSketchAgg(Bridge.expression(c), p).toAggregateExpression())

  /** Column API: `hll_merge(sketchCol)` — union of stored sketches. */
  def hll_merge(c: Column): Column =
    Bridge.column(HllMergeAgg(Bridge.expression(c)).toAggregateExpression())

  /** Column API: `hll_estimate(sketchCol)` — scalar estimate. */
  def hll_estimate(c: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(c)))
}
