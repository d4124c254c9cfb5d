package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership as a (build aggregate, probe expression)
  * pair — the map-side pre-filter for incremental-ingest joins.
  *
  * The 100 TB use: "which of today's N documents might already be in
  * the corpus?" answered WITHOUT joining N rows against the corpus
  * index. Build once over the corpus fingerprints (`bloom_build` —
  * partial filters OR-merge losslessly, so the build is one pass with
  * map-side combine), ship the filter bytes as a literal/broadcast,
  * and `bloom_might_contain` prunes map-side at scan speed. Only the
  * maybe-seen survivors (a few % false positives + the true dups) pay
  * the real index join. No false negatives, ever — a definite-new doc
  * never reaches the join.
  *
  * Serialized layout: [k:int][pad:int][bit words…] — the probe reads k
  * from the filter itself, so build and probe can't drift apart.
  * Hashing: double hashing h_i = h1 + i·h2 over splitmix64/FNV-1a
  * mixes (same kernels as [[Hll]]) — deterministic everywhere.
  */
object BloomOps {

  /** (h1, h2) for double hashing; h2 forced odd so the probe sequence
    * cycles through the whole bit space. */
  def hashPair(dt: DataType): Any => (Long, Long) = dt match {
    case LongType => v => {
      val x = v.asInstanceOf[Long]
      (Hll.mix64(x), Hll.mix64(x ^ 0x9E3779B97F4A7C15L) | 1L)
    }
    case IntegerType => v => {
      val x = v.asInstanceOf[Int].toLong
      (Hll.mix64(x), Hll.mix64(x ^ 0x9E3779B97F4A7C15L) | 1L)
    }
    case StringType => v => {
      val h = Hll.hashBytes(v.asInstanceOf[UTF8String].getBytes)
      (h, Hll.mix64(h ^ 0x9E3779B97F4A7C15L) | 1L)
    }
    case other => throw new IllegalArgumentException(
      s"bloom filter supports BIGINT/INT/STRING inputs, got $other")
  }

  def set(words: Array[Long], nBits: Int, k: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits).toInt
      words(bit >> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(k).putInt(0)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** Probe serialized filter bytes directly (no copy of the words —
    * reads through the ByteBuffer). The filter arrives as an arbitrary
    * BINARY column value, so the header is VALIDATED, not trusted: a
    * malformed k would otherwise drive a ~2^31-iteration probe loop or
    * a divide-by-zero, and a truncated buffer an out-of-bounds read. */
  def mightContain(bytes: Array[Byte], h1: Long, h2: Long): Boolean = {
    if (bytes.length < 16 || (bytes.length - 8) % 8 != 0)
      throw new IllegalArgumentException(
        s"not a bloom filter: ${bytes.length} bytes (need 8-byte header + 8-byte words)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt(0)
    if (k < 1 || k > 16)
      throw new IllegalArgumentException(s"not a bloom filter: k=$k outside [1, 16]")
    // Long arithmetic: at >256 MiB an Int (len-8)*8 overflows negative
    // and the probe would surface a confusing ByteBuffer bounds error
    // instead of a modulus — the bit index can legitimately exceed
    // Int range for filters over 256 MiB, so it stays a Long too.
    val nBits = (bytes.length - 8).toLong * 8L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      if ((bb.getLong(8 + (bit >> 6).toInt * 8) & (1L << (bit & 63).toInt)) == 0) return false
      i += 1
    }
    true
  }

  // typed probe entry points for generated code (no tuple boxing)
  def probeLong(bytes: Array[Byte], v: Long): Boolean =
    mightContain(bytes, Hll.mix64(v), Hll.mix64(v ^ 0x9E3779B97F4A7C15L) | 1L)
  def probeInt(bytes: Array[Byte], v: Int): Boolean = probeLong(bytes, v.toLong)
  def probeString(bytes: Array[Byte], v: UTF8String): Boolean = {
    val h = Hll.hashBytes(v.getBytes)
    mightContain(bytes, h, Hll.mix64(h ^ 0x9E3779B97F4A7C15L) | 1L)
  }
}

/** `bloom_build(v, nBits, k) -> BINARY` — build a Bloom filter over a
  * column. Partial filters merge by bitwise OR (lossless union). */
case class BloomBuild(
    child: Expression,
    nBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nBits >= 64 && nBits % 64 == 0, s"nBits must be a positive multiple of 64, got $nBits")
  require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_build supports BIGINT/INT/STRING inputs, got ${dt.sql}")
  }

  private lazy val hasher = BloomOps.hashPair(child.dataType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = hasher(v)
      BloomOps.set(buffer, nBits, k, h1, h2)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomOps.serialize(buffer, k)

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
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** `bloom_probe(filter BINARY, v) -> BOOLEAN` — true if `v` MIGHT be
  * in the set the filter was built over (false ⇒ definitely not). */
case class BloomProbe(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe takes (BINARY, BIGINT/INT/STRING), got (${l.sql}, ${r.sql})")
  }

  private lazy val hasher = BloomOps.hashPair(right.dataType)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(filter: Any, v: Any): Any = {
    val (h1, h2) = hasher(v)
    BloomOps.mightContain(filter.asInstanceOf[Array[Byte]], h1, h2)
  }

  // derived from the class so a rename breaks the compile, not Janino
  private def H = BloomOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case LongType    => defineCodeGen(ctx, ev, (f, v) => s"$H.probeLong($f, $v)")
      case IntegerType => defineCodeGen(ctx, ev, (f, v) => s"$H.probeInt($f, $v)")
      case _           => defineCodeGen(ctx, ev, (f, v) => s"$H.probeString($f, $v)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  /** Column API. `bloom_build(c, nBits, k)` aggregates to filter
    * bytes; `bloom_probe(filterCol, c)` tests membership. */
  def bloom_build(c: Column, nBits: Int = 1 << 20, k: Int = 5): Column =
    Bridge.column(BloomBuild(Bridge.expression(c), nBits, k).toAggregateExpression())
  def bloom_probe(filter: Column, c: Column): Column =
    Bridge.column(BloomProbe(Bridge.expression(filter), Bridge.expression(c)))
}
