package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** True iff the input vector's 4dp-rounded cosine against ANY row of a
  * FOLDABLE vector-matrix literal reaches `threshold` — the serve-time
  * semantic-decontamination kernel behind
  * [[graft.streaming.StreamOps.decontaminateEmbedStream]]. Children:
  * (vec array<double>, matrix array<array<double>> literal,
  * threshold double literal).
  *
  * The matrix is the eval-suite embedding set — bounded by the
  * eval-suite contract (thousands of rows, not a corpus), so it rides
  * the plan as a foldable literal (the [[BloomContains]] pattern);
  * norms precompute once per task. The per-candidate arithmetic —
  * length-min dot product, `BigDecimal.valueOf` HALF_UP 4dp rounding,
  * `>= threshold` — replays the batch
  * [[graft.ann.Knn.decontaminateEmbed]] verify bit-for-bit
  * (spec-pinned vs the boxed UDF this replaces). Zero-norm vectors on
  * either side never hit. Null input vector yields null (callers
  * coalesce to keep the legacy false-on-null filter behavior); null
  * matrix rows are skipped.
  */
case class CosineAnyAbove(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && matOk && second.foldable &&
        third.dataType == DoubleType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_any requires (array<double>, array<array<double>> literal, " +
        s"double literal), got ${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cosine_any"

  // matrix + norms parsed once per (de)serialized instance from the
  // foldable literal
  @transient private lazy val model: CosineAnyAbove.Model = {
    val ad = second.eval(null).asInstanceOf[ArrayData]
    val rows = (0 until ad.numElements()).iterator
      .filterNot(ad.isNullAt)
      .map(i => ad.getArray(i).toDoubleArray())
      .toArray
    val norms = rows.map(v => math.sqrt(v.map(x => x * x).sum))
    CosineAnyAbove.Model(rows, norms, third.eval(null).asInstanceOf[Double])
  }

  override def nullSafeEval(v: Any, m: Any, t: Any): Any =
    CosineAnyAbove.hit(model, v.asInstanceOf[ArrayData].toDoubleArray())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosModel", model,
      classOf[CosineAnyAbove.Model].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.CosineAnyAbove.hit($ref, $v.toDoubleArray());")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CosineAnyAbove =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CosineAnyAbove {

  case class Model(rows: Array[Array[Double]], norms: Array[Double], threshold: Double)

  /** Shared by interpreted eval and generated code. */
  def hit(m: Model, arr: Array[Double]): Boolean = {
    var n = 0.0
    var j = 0
    while (j < arr.length) { n += arr(j) * arr(j); j += 1 }
    n = math.sqrt(n)
    var i = 0
    var found = false
    while (i < m.rows.length && !found) {
      val ev = m.rows(i)
      val en = m.norms(i)
      if (n > 0 && en > 0) {
        var d = 0.0
        var k = 0
        val len = math.min(arr.length, ev.length)
        while (k < len) { d += arr(k) * ev(k); k += 1 }
        // Spark round() semantics (BigDecimal.valueOf, HALF_UP): the
        // batch operator's 4dp-rounded compare, replicated exactly
        val c = BigDecimal.decimal(d / (n * en))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (c >= m.threshold) found = true
      }
      i += 1
    }
    found
  }

  val info = (
    FunctionIdentifier("graft_cosine_any"),
    new ExpressionInfo(classOf[CosineAnyAbove].getName, "graft_cosine_any"),
    (children: Seq[Expression]) => CosineAnyAbove(children(0), children(1), children(2)): Expression)
}
