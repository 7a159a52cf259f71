package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The k smallest DISTINCT longs per group, as a sorted array — the
  * bounded partial aggregate behind the KMV sketch tier
  * (`Sketches.kmvDistinct`'s scale path) and any bottom-k-by-hash
  * selection.
  *
  * Why a custom aggregate: the idiomatic plan is `distinct()` (a full
  * shuffle of every value) then a per-group sort window (a full sort
  * of the distinct set) just to read off the k-th smallest. This
  * aggregate keeps ≤ k longs per group and participates in partial
  * aggregation: each partition reduces locally to one k-capped sorted
  * buffer per key (duplicates collapse ON INSERT — no distinct pass),
  * and only #keys × k longs cross the wire. Bottom-k is
  * merge-associative (bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  * bottomK(B))), so the result is partitioning-invariant — the same
  * property the KMV estimator itself relies on.
  *
  * Buffer: a sorted long array (size ≤ k). Insert is a binary search +
  * arraycopy — O(log k + k) worst case against a k of a few hundred,
  * and values ABOVE the current k-th are rejected with the binary
  * search alone once the buffer fills. Null inputs are skipped; an
  * empty group yields an empty array (never null).
  */
case class BottomKLongAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "graft_bottom_k: k must be a literal int")
    val kk = v.asInstanceOf[Number].intValue()
    require(kk >= 1, s"graft_bottom_k: k must be >= 1, got $kk")
    kk
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, kExpr.foldable) match {
      case (LongType, IntegerType, true) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bottom_k requires (bigint, literal int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def insert(buffer: Array[Long], v: Long): Array[Long] =
    BottomKLongAgg.insertSorted(buffer, k, v)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer else insert(buffer, v.asInstanceOf[Long])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var out = buffer
    var i = 0
    while (i < other.length) { out = insert(out, other(i)); i += 1 }
    out
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKLongAgg {

  /** Insert `v` into a sorted ≤k distinct-longs buffer (no-op on
    * duplicate or when the buffer is full and v ≥ its max) — the
    * aggregate's update/merge kernel, shared with the streaming KMV
    * state fold so live sketch state pays the same O(log k +
    * arraycopy) per key instead of a boxed set rebuild.
    */
  def insertSorted(buffer: Array[Long], k: Int, v: Long): Array[Long] = {
    val n = buffer.length
    if (n == k && v >= buffer(n - 1)) return buffer
    val pos = {
      val i = java.util.Arrays.binarySearch(buffer, v)
      if (i >= 0) return buffer // duplicate
      -(i + 1)
    }
    val out = new Array[Long](math.min(n + 1, k))
    System.arraycopy(buffer, 0, out, 0, pos)
    out(pos) = v
    System.arraycopy(buffer, pos, out, pos + 1, out.length - pos - 1)
    out
  }

  val info = (
    FunctionIdentifier("graft_bottom_k"),
    new ExpressionInfo(classOf[BottomKLongAgg].getName, "graft_bottom_k"),
    (children: Seq[Expression]) => BottomKLongAgg(children(0), children(1)): Expression)
}
