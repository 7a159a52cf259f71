package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native hypergeometric tail probability P(X >= kS) given ln pmf(kS)
  * (reference semantics: src/linkml_store/utils/enrichment_analyzer.py
  * p-value; see [[graft.ops.Enrichment]]).
  *
  * Why a custom Expression: the SQL formulation folds the pmf-ratio
  * recurrence with `aggregate(sequence(...))` — a higher-order function
  * evaluated INTERPRETED, one closure call per term. Frequent
  * categories fold thousands of terms per row, which made the fold the
  * hot half of enrichment. This expression runs the identical loop as
  * primitive doubles inside whole-stage codegen.
  *
  * Arithmetic is ORDER-IDENTICAL to the SQL fold on both the upper
  * branch (ascending i, acc_p starts 1, acc_s starts 1) and the lower
  * branch (descending i, acc_s starts 0, P = 1 - pmf * sum), and the
  * shorter side is chosen by the same rule — so results are
  * bit-identical to the lambda formulation and the DuckDB oracle keeps
  * matching at 4dp.
  */
case class HypergeomTail(
    kS: Expression, kG: Expression, nS: Expression, nG: Expression,
    lnPmf: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(kS, kG, nS, nG, lnPmf)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(kS, kG, nS, nG).forall(_.dataType == LongType) &&
      lnPmf.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_hypergeom_tail requires (bigint, bigint, bigint, bigint, double), got " +
        children.map(_.dataType).mkString(", "))
  }
  override def prettyName: String = "graft_hypergeom_tail"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else HypergeomTail.compute(
      vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Long],
      vs(4).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val Seq(e0, e1, e2, e3, e4) = children.map(_.genCode(ctx))
    ev.copy(code =
      code"""
        ${e0.code}
        ${e1.code}
        ${e2.code}
        ${e3.code}
        ${e4.code}
        boolean ${ev.isNull} = ${e0.isNull} || ${e1.isNull} || ${e2.isNull} ||
          ${e3.isNull} || ${e4.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.HypergeomTail$$.MODULE$$.compute(
            ${e0.value}, ${e1.value}, ${e2.value}, ${e3.value}, ${e4.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HypergeomTail =
    copy(kS = newChildren(0), kG = newChildren(1), nS = newChildren(2),
      nG = newChildren(3), lnPmf = newChildren(4))
}

object HypergeomTail {

  /** The loop both eval and generated code call — one implementation,
    * term order identical to the SQL fold it replaces.
    */
  def compute(kS: Long, kG: Long, nS: Long, nG: Long, lnPmf: Double): Double = {
    val hi = math.min(kG, nS)
    if (kS < hi - kS) {
      // lower tail: descending recurrence, P = 1 - pmf * sum
      var accP = 1.0
      var accS = 0.0
      var i = kS
      while (i >= 1) {
        val r = (i.toDouble * (nG - kG - nS + i)) /
          ((kG - i + 1).toDouble * (nS - i + 1))
        accP *= r
        accS += accP
        i -= 1
      }
      1.0 - math.exp(lnPmf) * accS
    } else if (hi <= kS) {
      math.exp(lnPmf)
    } else {
      // upper tail: ascending recurrence, sum includes the k_s term (1)
      var accP = 1.0
      var accS = 1.0
      var i = kS
      while (i < hi) {
        val r = ((kG - i).toDouble * (nS - i)) /
          ((i + 1).toDouble * (nG - kG - nS + i + 1))
        accP *= r
        accS += accP
        i += 1
      }
      math.exp(lnPmf) * accS
    }
  }

  val info = (
    FunctionIdentifier("graft_hypergeom_tail"),
    new ExpressionInfo(classOf[HypergeomTail].getName, "graft_hypergeom_tail"),
    (children: Seq[Expression]) => HypergeomTail(
      children(0), children(1), children(2), children(3), children(4)): Expression)
}
