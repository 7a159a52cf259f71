package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash fingerprint over a token-hash array
  * (see [[graft.dedup.SimHash]]).
  *
  * Why a custom Expression: the SQL formulation is 60 separate
  * `aggregate(hs, ...)` per-bit tallies — 60 interpreted closure folds
  * over the SAME array per document. This expression makes ONE pass,
  * tallying all 60 bits with primitive counters inside whole-stage
  * codegen. Integer arithmetic only (sum of plus/minus ones per bit),
  * so results are bit-identical to the SQL form and the DuckDB oracle.
  */
case class SimHashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<bigint>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashFingerprint.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs =>
      s"${ev.value} = graft.functions.SimHashFingerprint$$.MODULE$$.compute($hs);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFingerprint =
    copy(child = newChild)
}

object SimHashFingerprint {
  val Bits = 60

  /** One pass over the hashes, tallying all bits. */
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val tallies = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) tallies(b) += 1 else tallies(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (tallies(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  val info = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashFingerprint].getName, "graft_simhash"),
    (children: Seq[Expression]) => SimHashFingerprint(children.head): Expression)
}
