package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise sum of array columns — the distributed kernel behind
  * embedding centroids (sum / count per group), IVF cell re-centering,
  * and any "mean vector per key" reduction.
  *
  * Why a custom aggregate: without it the idiomatic plan is
  * `posexplode(embedding)` → groupBy(key, pos) → avg, which shuffles
  * n×dim ROWS (a 64-dim corpus moves 64× its row count through the
  * exchange). This aggregate keeps a dim-length double buffer per
  * group and participates in partial aggregation: each partition
  * reduces locally to ONE buffer per key, and only #keys × dim doubles
  * cross the wire. That is the difference between shuffling the corpus
  * and shuffling the model state.
  *
  * Null elements count as 0; null arrays are skipped; an empty group
  * (or all-null input) yields NULL. Mismatched lengths raise — vectors
  * in one column must share a dimension.
  */
case class ArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_array_sum requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_array_sum"

  // zero-length marks "no input seen yet" (a real input array always
  // allocates, and zero-length inputs are skipped below)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return buffer
    val buf = if (buffer.length == 0) new Array[Double](n) else buffer
    require(buf.length == n,
      s"graft_array_sum: mismatched lengths ${buf.length} vs $n")
    var i = 0
    if (elemType == FloatType) {
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"graft_array_sum: mismatched lengths ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySumAgg =
    copy(child = newChildren.head)
}

object ArraySumAgg {
  val info = (
    FunctionIdentifier("graft_array_sum"),
    new ExpressionInfo(classOf[ArraySumAgg].getName, "graft_array_sum"),
    (children: Seq[Expression]) => ArraySumAgg(children.head): Expression)
}
