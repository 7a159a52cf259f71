package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Σ table[h mod |table|] over a bigint-hash array against a FOLDABLE
  * double-table literal — the hashed-LM scoring kernel behind
  * [[graft.streaming.StreamOps.importanceScoreStream]] (DSIR log-ratio
  * per token bucket, summed per document).
  *
  * Why a custom Expression: the serve-time importance scorer runs on
  * EVERY ingested document; the boxed `Seq[Long]` UDF it replaces costs
  * an object array per row and drops the filter out of whole-stage
  * codegen, while the HOF formulation
  * (`aggregate(transform(hs, h -> element_at(t, ...)), ...)`) is
  * interpreted per element. This compiles to a primitive loop over a
  * plan-carried `double[]` (the [[SortedLongContains]] foldable-literal
  * pattern — the model is bounded driver state, nBuckets doubles).
  *
  * Indexing is `floorMod(h, len)` — identical to the batch model's
  * `h % nBuckets` for the non-negative 60-bit hashes both paths feed
  * it, and total (no AIOOBE) on arbitrary input. Null hash ELEMENTS
  * are skipped; a null array yields null.
  */
case class TableSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && (right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && right.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_table_sum requires (array<bigint>, array<double> literal), " +
        s"got ${left.dataType}, ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_table_sum"

  @transient private lazy val table: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(v: Any, ignored: Any): Any = {
    val ad = v.asInstanceOf[ArrayData]
    val t = table
    val n = ad.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i))
        s += t(java.lang.Math.floorMod(ad.getLong(i), t.length.toLong).toInt)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("table", table, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $v.numElements();
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    ${ev.value} += $ref[(int) java.lang.Math.floorMod($v.getLong($i), (long) $ref.length)];
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TableSum =
    copy(left = newLeft, right = newRight)
}

object TableSum {
  val info = (
    FunctionIdentifier("graft_table_sum"),
    new ExpressionInfo(classOf[TableSum].getName, "graft_table_sum"),
    (children: Seq[Expression]) => TableSum(children(0), children(1)): Expression)
}
