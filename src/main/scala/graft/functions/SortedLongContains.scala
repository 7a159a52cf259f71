package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Membership of a bigint in a FOLDABLE bigint-array literal via
  * binary search: O(log n) per row against `array_contains`'s O(n)
  * linear scan of the literal.
  *
  * This is the broadcast-set membership kernel for driver-bounded sets
  * that can still reach 10^5 entries — e.g.
  * [[graft.text.Clean.dropBoilerplate]]'s boilerplate line-hash set at
  * its `maxBoilerplate` cap, where `array_contains` costs
  * O(lines x 100k) per corpus scan and this costs O(lines x 17). The
  * set literal is evaluated ONCE per task at codegen/eval setup (it is
  * required foldable), sorted defensively, and referenced as a plain
  * `long[]` in generated code — no per-row allocation, no boxing.
  *
  * SQL twin (kept for the property spec):
  * `array_contains(lit, x)` — identical semantics for non-null
  * elements; null left input yields null on both forms.
  */
case class SortedLongContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType &&
        (right.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        }) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_contains requires (bigint, array<bigint> literal), " +
        s"got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sorted_contains"

  // evaluated once per (de)serialized instance: the foldable literal
  // becomes a primitive sorted long[]; null slots are disallowed (the
  // callers build the set from driver-side collected longs)
  @transient private lazy val sorted: Array[Long] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val a = ad.toLongArray()
    java.util.Arrays.sort(a)
    a
  }

  override def nullSafeEval(v: Any, ignored: Any): Any =
    java.util.Arrays.binarySearch(sorted, v.asInstanceOf[Long]) >= 0

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = java.util.Arrays.binarySearch($ref, $v) >= 0;")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongContains =
    copy(left = newLeft, right = newRight)
}

object SortedLongContains {
  val info = (
    FunctionIdentifier("graft_sorted_contains"),
    new ExpressionInfo(classOf[SortedLongContains].getName, "graft_sorted_contains"),
    (children: Seq[Expression]) => SortedLongContains(children(0), children(1)): Expression)
}
