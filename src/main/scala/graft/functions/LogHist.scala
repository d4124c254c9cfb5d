package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Log-bucket quantile histogram — a DDSketch-style (Masson et al.,
  * VLDB'19) mergeable quantile summary built on the SAME fixed
  * monotone bucketing as the batch exact-quantile operator
  * ([[HashOps.logBucket]]: bit-length octave × 7 mantissa bits):
  * per-bucket counts in a sparse map.
  *
  * Why this shape at 100 TB / on a stream: quantile state is
  * O(#occupied buckets) ≤ 16384 longs — bounded whatever the value
  * cardinality — and merge is key-wise count addition (associative,
  * commutative), so partial summaries combine map-side in batch and
  * fold per micro-batch into the state store in streaming, with
  * retried batches unable to corrupt order statistics the way a
  * count-based approximation of a sorted structure would.
  *
  * Accuracy contract (integer-exact, what the oracle checks): the
  * quantile read returns the LOWER BOUND of the bucket containing
  * target rank ⌈p·W⌉, so for non-negative values
  * `est ≤ exact_percentile_disc ≤ est + est div 64 + 1`
  * (bucket relative width ≤ 1/64 above the lower bound; buckets for
  * values < 128 are singletons, i.e. exact). */
object LogHist {

  /** Sparse (bucket → count) map codec: 12 bytes per occupied bucket. */
  private[functions] def serialize(m: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 12 * m.size())
    bb.putInt(m.size())
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Integer, java.lang.Long](math.max(16, n * 2))
    var i = 0
    while (i < n) { val k = bb.getInt; val v = bb.getLong; m.put(k, v); i += 1 }
    m
  }

  /** Lower bound of a non-negative log bucket — the inverse of
    * [[HashOps.logBucket]]'s floor. Buckets with octave ≤ 7 hold one
    * value each (the mantissa IS the value). */
  def bucketLowerBound(b: Int): Long = {
    require(b >= 0, s"negative-value buckets not supported in quantile read: $b")
    val bl = b >> 7
    val mant = (b & 127).toLong
    if (bl <= 7) mant else mant << (bl - 7)
  }

  /** Quantile read at exact rational p = num/den: walk buckets in
    * order, return the lower bound of the bucket containing rank
    * ⌈num·W/den⌉ (clamped to ≥ 1). */
  def quantile(bytes: Array[Byte], num: Long, den: Long): Long = {
    val m = deserialize(bytes)
    val keys = new Array[Int](m.size())
    val it = m.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    var w = 0L
    i = 0
    while (i < keys.length) { w += m.get(keys(i)); i += 1 }
    if (w == 0L) return 0L
    val rank = math.max(1L, (num * w + den - 1) / den)
    var cum = 0L
    i = 0
    while (i < keys.length) {
      cum += m.get(keys(i))
      if (cum >= rank) return bucketLowerBound(keys(i))
      i += 1
    }
    bucketLowerBound(keys(keys.length - 1))
  }

  def lb_hist(c: Column): Column =
    Bridge.column(LbHistAgg(Bridge.expression(c)).toAggregateExpression())
  def lb_merge(c: Column): Column =
    Bridge.column(LbMergeAgg(Bridge.expression(c)).toAggregateExpression())
  def lb_quantile(sketch: Column, num: Int, den: Int): Column =
    Bridge.column(LbQuantile(Bridge.expression(sketch), num, den))
}

/** `lb_hist(v) -> BINARY` — build the sparse log-bucket histogram. */
case class LbHistAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lb_hist takes BIGINT/INT values, got ${dt.sql}")
    }

  private lazy val asLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _        => v => v.asInstanceOf[Int].toLong
  }

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  override def update(
      buffer: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = HashOps.logBucket(asLong(v))
      buffer.merge(b, 1L, (a, x) => a + x)
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[Integer, java.lang.Long],
      other: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.merge(e.getKey, e.getValue, (a, x) => a + x)
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[Integer, java.lang.Long]): Any =
    LogHist.serialize(buffer)

  override def serialize(buffer: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] =
    LogHist.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] =
    LogHist.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "lb_hist"

  override def withNewMutableAggBufferOffset(newOffset: Int): LbHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LbHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LbHistAgg =
    copy(child = newChild)
}

/** `lb_merge(sketch) -> BINARY` — key-wise count addition over stored
  * histogram blobs: the re-aggregation half of the rollup. */
case class LbMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lb_merge takes an lb_hist BINARY column, got ${dt.sql}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  private def addAll(
      buffer: java.util.HashMap[Integer, java.lang.Long],
      m: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.merge(e.getKey, e.getValue, (a, x) => a + x)
    }
    buffer
  }

  override def update(
      buffer: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] =
    child.eval(input) match {
      case null           => buffer
      case b: Array[Byte] => addAll(buffer, LogHist.deserialize(b))
      case other => throw new IllegalArgumentException(
        s"lb_merge expects BINARY sketches, got: $other")
    }

  override def merge(
      buffer: java.util.HashMap[Integer, java.lang.Long],
      other: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] =
    addAll(buffer, other)

  override def eval(buffer: java.util.HashMap[Integer, java.lang.Long]): Any =
    LogHist.serialize(buffer)

  override def serialize(buffer: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] =
    LogHist.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] =
    LogHist.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "lb_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): LbMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LbMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LbMergeAgg =
    copy(child = newChild)
}

/** `lb_quantile(sketch, num, den) -> BIGINT` — quantile read at exact
  * rational num/den (lower bound of the rank-⌈p·W⌉ bucket). */
case class LbQuantile(child: Expression, num: Int, den: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(den > 0 && num >= 0, s"invalid quantile $num/$den")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lb_quantile takes an lb_hist BINARY column, got ${dt.sql}")
    }

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    LogHist.quantile(input.asInstanceOf[Array[Byte]], num.toLong, den.toLong)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val h = LogHist.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$h.quantile($c, ${num}L, ${den}L)")
  }

  override def prettyName: String = "lb_quantile"
  override protected def withNewChildInternal(newChild: Expression): LbQuantile =
    copy(child = newChild)
}
