package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a (build
  * aggregate, point-query expression) pair — approximate frequencies
  * for ARBITRARY keys in fixed memory, complementing [[MisraGries]]
  * (which surfaces only the top candidates).
  *
  * Guarantees (d rows × w counters): `cms_query` never underestimates;
  * overestimate ≤ n/w per row, and the min over d independent rows
  * makes a large error exponentially unlikely (≤ (1/2)^d at width
  * 2e/ε). Counters are SUMS, so the sketch is exactly
  * order-independent and partial sketches merge by entry-wise add —
  * map-side combine ships d·w longs per partition regardless of input
  * size, the property that makes corpus-wide token statistics
  * O(sketch) instead of O(vocabulary) at 100 TB.
  *
  * Layout: [w:int][d:int][d·w counter longs]. The query reads (w, d)
  * from the sketch itself and VALIDATES them against the byte length —
  * never trusting a binary column's header. Hashing: same
  * splitmix64/FNV-1a double-hashing kernels as [[BloomOps]]/[[Hll]].
  */
object CmsOps {

  def set(buf: Array[Long], w: Int, d: Int, h1: Long, h2: Long): Unit = {
    var r = 0
    while (r < d) {
      buf(r * w + java.lang.Long.remainderUnsigned(h1 + r * h2, w).toInt) += 1L
      r += 1
    }
  }

  def serialize(buf: Array[Long], w: Int, d: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(w).putInt(d)
    buf.foreach(bb.putLong)
    bb.array()
  }

  /** Min-over-rows point estimate straight off the serialized bytes. */
  def query(bytes: Array[Byte], h1: Long, h2: Long): Long = {
    if (bytes.length < 16)
      throw new IllegalArgumentException(s"not a CMS sketch: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val w = bb.getInt(0)
    val d = bb.getInt(1 * 4)
    if (w < 1 || d < 1 || d > 32 ||
      bytes.length.toLong != 8L + w.toLong * d * 8)
      throw new IllegalArgumentException(s"not a CMS sketch: w=$w d=$d len=${bytes.length}")
    var min = Long.MaxValue
    var r = 0
    while (r < d) {
      val idx = r * w + java.lang.Long.remainderUnsigned(h1 + r * h2, w).toInt
      val c = bb.getLong(8 + idx * 8)
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Inner product of two same-shape sketches: min over rows of
    * Σ_j rowA[j]·rowB[j] — the Count-Min estimate of the JOIN SIZE
    * Σ_v fA(v)·fB(v) (AMS/CM inner product, Cormode & Muthukrishnan
    * §4.2). Never underestimates; per-row overestimate ≤ N_A·N_B/w.
    * The optimizer-statistics read: join cardinality from two 128 KiB
    * blobs, no key ever shuffled. */
  def inner(a: Array[Byte], b: Array[Byte]): Long = {
    def shape(bytes: Array[Byte]): (Int, Int) = {
      if (bytes.length < 16)
        throw new IllegalArgumentException(s"not a CMS sketch: ${bytes.length} bytes")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val (w, d) = (bb.getInt(0), bb.getInt(4))
      if (w < 1 || d < 1 || d > 32 ||
        bytes.length.toLong != 8L + w.toLong * d * 8)
        throw new IllegalArgumentException(s"not a CMS sketch: w=$w d=$d len=${bytes.length}")
      (w, d)
    }
    val (wa, da) = shape(a)
    val (wb, db) = shape(b)
    if (wa != wb || da != db)
      throw new IllegalArgumentException(
        s"cms_inner requires same-shape sketches, got ($wa,$da) vs ($wb,$db)")
    val (ba, bb) = (java.nio.ByteBuffer.wrap(a), java.nio.ByteBuffer.wrap(b))
    // Per-cell products reach N_A·N_B, so the row sum can exceed int64
    // (sides ≥ ~3e9 each). Saturate at Long.MaxValue instead of
    // wrapping: a wrapped-negative row sum would become the min and
    // silently violate the never-underestimates guarantee.
    var min = Long.MaxValue
    var r = 0
    while (r < da) {
      var s = 0L
      var sat = false
      var j = 0
      while (j < wa && !sat) {
        val idx = 8 + (r * wa + j) * 8
        try s = Math.addExact(s, Math.multiplyExact(ba.getLong(idx), bb.getLong(idx)))
        catch { case _: ArithmeticException => sat = true }
        j += 1
      }
      if (!sat && s < min) min = s
      r += 1
    }
    min
  }

  // typed entry points for generated code (no tuple boxing)
  def queryLong(bytes: Array[Byte], v: Long): Long =
    query(bytes, Hll.mix64(v), Hll.mix64(v ^ 0x9E3779B97F4A7C15L) | 1L)
  def queryInt(bytes: Array[Byte], v: Int): Long = queryLong(bytes, v.toLong)
  def queryString(bytes: Array[Byte], v: UTF8String): Long = {
    val h = Hll.hashBytes(v.getBytes)
    query(bytes, h, Hll.mix64(h ^ 0x9E3779B97F4A7C15L) | 1L)
  }
}

/** `cms_build(v, w, d) -> BINARY` — Count-Min sketch over a column.
  * Partial sketches merge by entry-wise counter addition (lossless). */
case class CmsBuild(
    child: Expression,
    w: Int,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(w >= 8 && w <= (1 << 24), s"width must be in [8, 2^24], got $w")
  require(d >= 1 && d <= 32, s"depth must be in [1, 32], got $d")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cms_build supports BIGINT/INT/STRING inputs, got ${dt.sql}")
  }

  private lazy val hasher = BloomOps.hashPair(child.dataType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](w * d)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = hasher(v)
      CmsOps.set(buffer, w, d, h1, h2)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = CmsOps.serialize(buffer, w, d)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(i * 8); i += 1 }
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsBuild =
    copy(child = newChild)
}

/** `cms_query(sketch BINARY, v) -> BIGINT` — never-underestimating
  * frequency estimate of `v` in the sketched stream. */
case class CmsQuery(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_query takes (BINARY, BIGINT/INT/STRING), got (${l.sql}, ${r.sql})")
  }

  private lazy val hasher = BloomOps.hashPair(right.dataType)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"

  override protected def nullSafeEval(sketch: Any, v: Any): Any = {
    val (h1, h2) = hasher(v)
    CmsOps.query(sketch.asInstanceOf[Array[Byte]], h1, h2)
  }

  // derived from the class so a rename breaks the compile, not Janino
  private def H = CmsOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case LongType    => defineCodeGen(ctx, ev, (f, v) => s"$H.queryLong($f, $v)")
      case IntegerType => defineCodeGen(ctx, ev, (f, v) => s"$H.queryInt($f, $v)")
      case _           => defineCodeGen(ctx, ev, (f, v) => s"$H.queryString($f, $v)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

/** `cms_inner(a BINARY, b BINARY) -> BIGINT` — join-size estimate via
  * the sketch inner product ([[CmsOps.inner]]). */
case class CmsInner(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_inner takes (BINARY, BINARY), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsOps.inner(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  private def H = CmsOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$H.inner($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInner =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  /** Column API. `cms_build(c, w, d)` aggregates to sketch bytes;
    * `cms_query(sketchCol, c)` point-estimates a key's frequency;
    * `cms_inner(a, b)` estimates the join size Σ_v fA(v)·fB(v). */
  def cms_build(c: Column, w: Int = 1 << 12, d: Int = 4): Column =
    Bridge.column(CmsBuild(Bridge.expression(c), w, d).toAggregateExpression())
  def cms_query(sketch: Column, c: Column): Column =
    Bridge.column(CmsQuery(Bridge.expression(sketch), Bridge.expression(c)))
  def cms_inner(a: Column, b: Column): Column =
    Bridge.column(CmsInner(Bridge.expression(a), Bridge.expression(b)))
}
