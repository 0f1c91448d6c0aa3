package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Element-wise mean of float/double vectors — embedding POOLING as a real
  * aggregate: mean-pool token embeddings to a document vector, centroid of
  * a cluster's members, per-source average embeddings.
  *
  * Scale shape: the naive formulation (posexplode → groupBy (id, pos) →
  * avg → re-assemble) shuffles O(rows × dim) exploded elements and needs a
  * second aggregation to rebuild the array. This aggregate's state is ONE
  * dim-sized double array + a count, map-side combined like any partial
  * aggregate: a group spanning P partitions ships P fixed-width partials,
  * and vectors never explode. Sums accumulate in double regardless of
  * input precision.
  *
  * Contract: null INPUT rows are skipped (SQL aggregate semantics); a null
  * ELEMENT or a dimension mismatch within a group throws (an embedding
  * column with ragged dimensions is corrupt — averaging the overlap would
  * silently fabricate vectors). A group with no non-null input evaluates
  * to null.
  */
case class VecMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMean.Buffer] with UnaryLike[Expression] {

  @transient private lazy val elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_mean"

  override def createAggregationBuffer(): VecMean.Buffer = new VecMean.Buffer

  override def update(b: VecMean.Buffer, input: InternalRow): VecMean.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      else require(b.sums.length == n,
        s"$prettyName: dimension mismatch in group (${b.sums.length} vs $n)")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"$prettyName: null element at position $i")
        b.sums(i) += (elemType match {
          case FloatType => arr.getFloat(i).toDouble
          case _         => arr.getDouble(i)
        })
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: VecMean.Buffer, other: VecMean.Buffer): VecMean.Buffer = {
    if (other.sums != null) {
      if (b.sums == null) { b.sums = other.sums.clone(); b.n = other.n }
      else {
        require(b.sums.length == other.sums.length,
          s"$prettyName: dimension mismatch across partials")
        var i = 0
        while (i < b.sums.length) { b.sums(i) += other.sums(i); i += 1 }
        b.n += other.n
      }
    }
    b
  }

  override def eval(b: VecMean.Buffer): Any =
    if (b.sums == null || b.n == 0L) null
    else new GenericArrayData(b.sums.map(_ / b.n))

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(DoubleType, containsNull = false), LongType))
  @transient private lazy val row = new UnsafeRow(2)

  override def serialize(b: VecMean.Buffer): Array[Byte] = {
    val sums = if (b.sums == null) new Array[Double](0) else b.sums
    projection.apply(InternalRow.apply(new GenericArrayData(sums), b.n)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): VecMean.Buffer = {
    val b = new VecMean.Buffer
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    b.n = row.getLong(1)
    // n > 0 with an empty sums array is a legitimate state (a group of
    // zero-dimensional vectors) — distinguish it from "no input yet".
    if (arr.numElements() > 0 || b.n > 0) b.sums = arr.toDoubleArray()
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecMean {
  /** Mutable partial state: element sums (null until the first vector fixes
    * the dimension) + contributing row count.
    */
  final class Buffer {
    var sums: Array[Double] = _
    var n: Long = 0L
  }
}
