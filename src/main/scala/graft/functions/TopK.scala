package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `topk_keys(key BIGINT, ord BIGINT, k) -> ARRAY<BIGINT>` — grouped
  * top-k as a bounded-state aggregate.
  *
  * The window idiom (`row_number() OVER (PARTITION BY g ORDER BY ord
  * DESC) <= k`) shuffles and SORTS every row of every group; at
  * 100 TB the sort dominates even though only k rows per group
  * survive. This aggregate keeps a k-entry min-heap per group:
  * map-side partials discard everything below the k-th candidate
  * BEFORE the shuffle, so the exchange carries at most k entries per
  * (partition, group) and no sort ever materializes. Same shape as
  * Spark's own `max_by` but for the k > 1 case.
  *
  * Determinism: candidates are totally ordered by (ord, key) — equal
  * `ord` ties break toward the larger key — so the result is
  * independent of arrival order, partitioning, and retries. The
  * output lists keys best-first.
  */
case class TopKKeys(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 100000, s"topk_keys k must be in [1, 100000], got $k")

  // min-heap on (ord, key): head is the WORST retained candidate
  private val heapOrd: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (kt, ot) => TypeCheckResult.TypeCheckFailure(
        s"topk_keys expects (BIGINT key, BIGINT ord), got (${kt.sql}, ${ot.sql})")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](heapOrd)

  private def offer(h: mutable.PriorityQueue[(Long, Long)], ord: Long, key: Long): Unit = {
    if (h.size < k) h.enqueue((ord, key))
    else if (Ordering.Tuple2(Ordering.Long, Ordering.Long).compare((ord, key), h.head) > 0) {
      h.dequeue(); h.enqueue((ord, key))
    }
  }

  override def update(
      h: mutable.PriorityQueue[(Long, Long)], input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val kv = left.eval(input)
    val ov = right.eval(input)
    if (kv != null && ov != null)
      offer(h, ov.asInstanceOf[Long], kv.asInstanceOf[Long])
    h
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, Long)],
      b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach { case (ord, key) => offer(a, ord, key) }
    a
  }

  override def eval(h: mutable.PriorityQueue[(Long, Long)]): Any = {
    val arr = h.toArray.sorted(Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse)
    new GenericArrayData(arr.map(_._2))
  }

  override def serialize(h: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + h.size * 16)
    bb.putInt(h.size)
    h.foreach { case (ord, key) => bb.putLong(ord); bb.putLong(key) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.enqueue((bb.getLong, bb.getLong)); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_keys"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKKeys =
    copy(left = newLeft, right = newRight)
}

object TopK {
  /** Column API: `topk_keys(key, ord, k)` — keys of the k largest
    * (ord, key) pairs, best-first. */
  def topk_keys(key: Column, ord: Column, k: Int): Column =
    Bridge.column(
      TopKKeys(Bridge.expression(key), Bridge.expression(ord), k).toAggregateExpression())
}
