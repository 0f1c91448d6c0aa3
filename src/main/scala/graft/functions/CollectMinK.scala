package graft.functions

import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded "first k ascending" collector: aggregates the k SMALLEST child
  * values per group into a sorted array — `sort_array(collect_list(x))[0:k]`
  * with O(k) state instead of O(group).
  *
  * This is what lets the exact-duplicate collapse derive its capped member
  * list from the SAME hash aggregation that elects the representative
  * (graft.dedup.Dedup.collapseKeyed): one corpus scan and one exchange
  * produce reps + members, where a join-back would re-scan the corpus and a
  * window would add another exchange. Scale shape: per-group state is a
  * size-k heap (map-side combined like any partial aggregate); a group
  * spanning P map partitions ships at most P·k values to its reducer —
  * bounded and independent of the group's row count, so a 100M-copy
  * boilerplate group can never gather on one task.
  *
  * Buffer ser/de follows the UnsafeProjection-over-array recipe of Spark's
  * own Collect/CollectTopK aggregates (collect.scala) — the standard
  * TypedImperativeAggregate pattern.
  */
case class CollectMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[Any]] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  @transient private lazy val asc: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_collect_min_k"

  // Max-heap of the k smallest seen so far: the root is the LARGEST retained
  // value — the first to evict when a smaller candidate arrives.
  override def createAggregationBuffer(): JPriorityQueue[Any] =
    new JPriorityQueue[Any](math.min(k, 16), asc.reverse)

  private def insert(q: JPriorityQueue[Any], v: Any): Unit =
    if (q.size < k) {
      q.offer(InternalRow.copyValue(v))
    } else if (asc.compare(v, q.peek) < 0) {
      q.poll()
      q.offer(InternalRow.copyValue(v))
    }

  override def update(q: JPriorityQueue[Any], input: InternalRow): JPriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(q, v)
    q
  }

  override def merge(q: JPriorityQueue[Any], other: JPriorityQueue[Any]): JPriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) insert(q, it.next()) // already copied at update time
    q
  }

  override def eval(q: JPriorityQueue[Any]): Any =
    new GenericArrayData(q.toArray.sorted(asc))

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(elementType = child.dataType, containsNull = false)))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(q: JPriorityQueue[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(q.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[Any] = {
    val q = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => insert(q, v))
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CollectMinK {
  /** The SQL-registry builder's k argument must be a plan-time int literal. */
  def expressionToK(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"graft_collect_min_k expects a literal int k, got $e")
  }
}
