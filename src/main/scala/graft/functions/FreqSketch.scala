package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012) as a
  * native Catalyst aggregate.
  *
  * Guarantee: after summarizing n items with k counters, every item
  * with true frequency > n/(k+1) is present in the summary (no false
  * negatives). Merging two summaries (entry-wise sum, then subtract
  * the (k+1)-th largest count and drop non-positives) preserves the
  * guarantee — so partial aggregation and shuffle-merge are lossless
  * with respect to the heavy-hitter set.
  *
  * Why at 100 TB: exact top-k term statistics need a full shuffle of
  * every distinct token. The summary is a fixed k-entry map per
  * group that combines map-side; the shuffle carries O(k) entries per
  * partition. The intended use is the two-pass heavy-hitter pipeline
  * (see `e2_heavy_tokens`): sketch → candidate set (tiny, broadcast)
  * → exact count of candidates only → threshold filter. The final
  * output is exact and deterministic; only the intermediate candidate
  * set is order-dependent, and it is guaranteed to be a superset.
  *
  * The summary's ITEMS (not counts) are exposed, sorted, as
  * `ARRAY<STRING>` — counts are lower bounds whose exact values
  * depend on arrival order, so surfacing them would make query output
  * nondeterministic under retries/repartitioning.
  */
object MisraGries {

  type Summary = mutable.HashMap[String, Long]

  def add(s: Summary, item: String, k: Int): Unit = {
    s.get(item) match {
      case Some(c) => s.update(item, c + 1)
      case None =>
        if (s.size < k) s.update(item, 1L)
        else {
          // decrement-all; drop zeros (O(k), k is small and constant).
          // Iterate over a key snapshot: mutating a HashMap (even
          // value-only updates) while iterating it is undefined.
          val ks = s.keys.toArray
          ks.foreach { key =>
            val c = s(key) - 1
            if (c <= 0) s.remove(key) else s.update(key, c)
          }
        }
    }
  }

  def merge(a: Summary, b: Summary, k: Int): Summary = {
    b.foreach { case (item, c) => a.update(item, a.getOrElse(item, 0L) + c) }
    if (a.size > k) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val ks = a.keys.toArray // snapshot: no mutation during iteration
      ks.foreach { key =>
        val c = a(key) - cut
        if (c <= 0) a.remove(key) else a.update(key, c)
      }
    }
    a
  }
}

/** `freq_candidates(s STRING, k INT) -> ARRAY<STRING>` — the
  * Misra–Gries candidate set: a superset of every item with frequency
  * > n/(k+1) in the group. Pair with an exact count of the candidates
  * for deterministic heavy hitters. */
case class FreqCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] with UnaryLike[Expression] {

  require(k >= 1 && k <= 100000, s"freq_candidates k must be in [1, 100000], got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_candidates supports STRING inputs (cast first), got ${dt.sql}")
    }

  override def createAggregationBuffer(): MisraGries.Summary =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) MisraGries.add(buffer, v.asInstanceOf[UTF8String].toString, k)
    buffer
  }

  override def merge(buffer: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary =
    MisraGries.merge(buffer, other, k)

  override def eval(buffer: MisraGries.Summary): Any = {
    val items = buffer.keysIterator.toArray
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(items.map(UTF8String.fromString(_)))
  }

  override def serialize(buffer: MisraGries.Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (item, c) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_candidates"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqCandidates =
    copy(child = newChild)
}

object FreqSketch {
  /** Column API: `freq_candidates(col, k)`. */
  def freq_candidates(c: Column, k: Int): Column =
    Bridge.column(FreqCandidates(Bridge.expression(c), k).toAggregateExpression())
}
