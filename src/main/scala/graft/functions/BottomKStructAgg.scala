package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}

/** The k smallest struct rows per group under the struct's natural
  * (field-by-field, nulls-first) ordering, as a sorted array — the
  * payload-carrying sibling of [[BottomKLongAgg]] for bottom-n-by-hash
  * ROW selection (`Sketches.quantileSketch`'s deterministic sample,
  * where the sample row must carry its value alongside its rank key).
  *
  * Why a custom aggregate: the idiomatic plan is a per-group
  * `row_number()` sort window over the FULL relation just to keep n
  * rows per group — at 100 TB that shuffles and sorts every row. This
  * aggregate keeps ≤ k rows per group and participates in partial
  * aggregation (each partition reduces locally; only #keys × k rows
  * cross the wire), and bottom-k is merge-associative, so the result
  * is partitioning-invariant.
  *
  * Unlike [[BottomKLongAgg]] (a distinct-set sketch), this is a
  * MULTISET bottom-k: duplicate rows are kept, so the result is
  * exactly "the first k rows in struct order" — well-defined across
  * engines whenever the struct is a TOTAL order over the payload
  * (include every emitted field in the struct; identical rows are then
  * interchangeable). Null structs are skipped; an empty group yields
  * an empty array.
  *
  * Buffer: a sorted ArrayBuffer of copied UnsafeRows. Insert is a
  * binary search + shift — O(log k + k) against a k of a few hundred,
  * and rows above the current k-th are rejected by one comparison once
  * the buffer fills.
  */
case class BottomKStructAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "graft_bottom_k_struct: k must be a literal int")
    val kk = v.asInstanceOf[Number].intValue()
    require(kk >= 1, s"graft_bottom_k_struct: k must be >= 1, got $kk")
    kk
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]

  private lazy val toUnsafe: UnsafeProjection = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, kExpr.foldable) match {
      case (s: StructType, IntegerType, true) if RowOrdering.isOrderable(s) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bottom_k_struct requires (orderable struct, literal int), got $other")
    }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "graft_bottom_k_struct"

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    new ArrayBuffer[UnsafeRow](math.min(k, 16))

  /** True iff the buffer is full and `v` sorts at-or-after its max —
    * the one-comparison rejection that keeps the full-buffer steady
    * state allocation-free.
    */
  private def rejected(buf: ArrayBuffer[UnsafeRow], v: UnsafeRow): Boolean =
    buf.length == k && ordering.compare(v, buf(buf.length - 1)) >= 0

  /** Upper-bound binary search: first index whose row sorts after v. */
  private def insertionPos(buf: ArrayBuffer[UnsafeRow], v: UnsafeRow): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Insert an OWNED row (safe to retain) into the sorted ≤k buffer. */
  private def insert(buf: ArrayBuffer[UnsafeRow], v: UnsafeRow): Unit = {
    if (rejected(buf, v)) return
    buf.insert(insertionPos(buf, v), v)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[UnsafeRow], input: InternalRow): ArrayBuffer[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      // project into the REUSED row first and reject full-buffer
      // misses before paying the copy — the steady state for almost
      // every row once buffers fill
      val row = toUnsafe(v.asInstanceOf[InternalRow])
      if (!rejected(buf, row)) {
        // copy: the projection output aliases a reused buffer
        val owned = row.copy()
        buf.insert(insertionPos(buf, owned), owned)
        if (buf.length > k) buf.remove(buf.length - 1)
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[UnsafeRow], other: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    // rows in `other` come from deserialize (freshly allocated) — the
    // TypedImperativeAggregate merge contract — so ownership transfers
    // without a copy
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.length)
    buf.foreach { r =>
      val bytes = r.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = new ArrayBuffer[UnsafeRow](math.max(n, 1))
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKStructAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKStructAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKStructAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKStructAgg {
  val info = (
    FunctionIdentifier("graft_bottom_k_struct"),
    new ExpressionInfo(classOf[BottomKStructAgg].getName, "graft_bottom_k_struct"),
    (children: Seq[Expression]) => BottomKStructAgg(children(0), children(1)): Expression)
}
