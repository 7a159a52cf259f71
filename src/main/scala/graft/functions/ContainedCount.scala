package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen "contained count" over two `array<bigint>` columns:
  * the number of LEFT elements (with multiplicity) that occur in RIGHT.
  *
  * This is the exact-verify kernel of the set-similarity joins
  * (MinHash / PPJoin jaccard): the DuckDB oracles compute
  * `len(list_filter(a, x -> list_contains(b, x)))` — left multiset
  * semantics — and the previous Spark formulation
  * `size(array_intersect(a, b))` counts DISTINCT shared values
  * instead. The two agree only while no document carries a duplicate
  * shingle (a repeated 3-token phrase breaks that), so the engines
  * could silently diverge on natural text. This expression pins the
  * oracle's semantics, in generated code, with no intersection-array
  * allocation.
  *
  * The SQL formulation twin (kept interpreted, for the property spec):
  * `size(filter(a, x -> array_contains(b, x)))`.
  */
case class ContainedCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_contained_count requires array<bigint> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_contained_count"

  // NULL SLOTS are skipped on both sides, matching the SQL twin's
  // three-valued logic: a null left element makes array_contains null,
  // which filter() treats as false (not counted); null right elements
  // can never equal a non-null value. getLong on a null slot would
  // otherwise read 0 and phantom-match a real 0L.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[java.lang.Long](y.numElements() * 2)
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j)) set.add(y.getLong(j))
      j += 1
    }
    var cnt = 0
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i) && set.contains(x.getLong(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      s"""
         |java.util.HashSet<Long> $set = new java.util.HashSet<Long>($y.numElements() * 2);
         |for (int $j = 0; $j < $y.numElements(); $j++) {
         |  if (!$y.isNullAt($j)) $set.add($y.getLong($j));
         |}
         |int $cnt = 0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  if (!$x.isNullAt($i) && $set.contains($x.getLong($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainedCount =
    copy(left = newLeft, right = newRight)
}

object ContainedCount {
  val info = (
    FunctionIdentifier("graft_contained_count"),
    new ExpressionInfo(classOf[ContainedCount].getName, "graft_contained_count"),
    (children: Seq[Expression]) => ContainedCount(children(0), children(1)): Expression)
}
