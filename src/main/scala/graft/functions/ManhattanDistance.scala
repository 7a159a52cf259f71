package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen Manhattan (L1) distance over two `array<double>`
  * columns — `sum(|a_i - b_i|)` folded in index order, so the DuckDB
  * twin `list_sum(list_transform(range(..), i -> abs(a[i]-b[i])))`
  * is bit-identical. Same rationale as [[DotProduct]]: the matcher's
  * manhattan metric (reference: src/linkml_store/utils/
  * embedding_matcher.py:147-155) runs per candidate pair, so the
  * kernel must live inside whole-stage codegen, not an interpreted
  * higher-order-function lambda.
  */
case class ManhattanDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l1 requires array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l1"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(x.getDouble(i) - y.getDouble(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Math.abs($x.getDouble($i) - $y.getDouble($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ManhattanDistance =
    copy(left = newLeft, right = newRight)
}

object ManhattanDistance {
  val info = (
    FunctionIdentifier("graft_l1"),
    new ExpressionInfo(classOf[ManhattanDistance].getName, "graft_l1"),
    (children: Seq[Expression]) => ManhattanDistance(children(0), children(1)): Expression)
}
