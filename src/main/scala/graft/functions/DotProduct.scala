package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * Why a custom Expression: the composable formulation
  * `aggregate(zip_with(a, b, *), 0d, +)` is correct but higher-order
  * functions are interpreted per element (lambda closure per item, no
  * whole-stage codegen participation). This expression compiles to a
  * tight primitive loop inside the generated code — the preference
  * order in SURVEY §2 ("native Catalyst Expression beats a UDF") made
  * concrete for the hottest vector kernel (ANN verify, find_matches).
  *
  * Semantics match the fold exactly: sequential accumulation in index
  * order over doubles (bit-identical results, so the DuckDB oracle is
  * unaffected). Null ELEMENTS are not supported (embedding vectors are
  * dense); null arrays propagate null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType is private[sql], so external expressions validate
  // explicitly instead of via ImplicitCastInputTypes; callers cast to
  // array<double> (VectorFunctions.dot does).
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
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
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val dotInfo = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression)

  /** Idempotent per-session registration (for sessions built without
    * the extensions config, e.g. tests).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(dotInfo._1, dotInfo._2, dotInfo._3)
    spark.sessionState.functionRegistry
      .registerFunction(HypergeomTail.info._1, HypergeomTail.info._2, HypergeomTail.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(SimHashFingerprint.info._1, SimHashFingerprint.info._2, SimHashFingerprint.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(HashedShingles.info._1, HashedShingles.info._2, HashedShingles.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(TrigramBuckets.info._1, TrigramBuckets.info._2, TrigramBuckets.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(RegexTokenCount.info._1, RegexTokenCount.info._2, RegexTokenCount.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(TextStats.info._1, TextStats.info._2, TextStats.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(MinHashSigs.info._1, MinHashSigs.info._2, MinHashSigs.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(TokenHashes60.info._1, TokenHashes60.info._2, TokenHashes60.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(RepetitionStats.info._1, RepetitionStats.info._2, RepetitionStats.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(RepetitionStats.info4._1, RepetitionStats.info4._2, RepetitionStats.info4._3)
    spark.sessionState.functionRegistry
      .registerFunction(ArraySumAgg.info._1, ArraySumAgg.info._2, ArraySumAgg.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(ContainedCount.info._1, ContainedCount.info._2, ContainedCount.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(ManhattanDistance.info._1, ManhattanDistance.info._2, ManhattanDistance.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(HashEmbedCounts.info._1, HashEmbedCounts.info._2, HashEmbedCounts.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(SortedLongContains.info._1, SortedLongContains.info._2, SortedLongContains.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(BpeApply.info._1, BpeApply.info._2, BpeApply.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(AudioRms.info._1, AudioRms.info._2, AudioRms.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(DeflateLen.info._1, DeflateLen.info._2, DeflateLen.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(BottomKLongAgg.info._1, BottomKLongAgg.info._2, BottomKLongAgg.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(BottomKStructAgg.info._1, BottomKStructAgg.info._2, BottomKStructAgg.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(BloomContains.info._1, BloomContains.info._2, BloomContains.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(TableSum.info._1, TableSum.info._2, TableSum.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(GroupCdfRank.info._1, GroupCdfRank.info._2, GroupCdfRank.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(CosineAnyAbove.info._1, CosineAnyAbove.info._2, CosineAnyAbove.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(QgramHashes.info._1, QgramHashes.info._2, QgramHashes.info._3)
    spark.sessionState.functionRegistry
      .registerFunction(SortedInterAtLeast.info._1, SortedInterAtLeast.info._2, SortedInterAtLeast.info._3)
  }
}

/** Session extension entry point: builders opt in via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotInfo)
    ext.injectFunction(HypergeomTail.info)
    ext.injectFunction(SimHashFingerprint.info)
    ext.injectFunction(HashedShingles.info)
    ext.injectFunction(TrigramBuckets.info)
    ext.injectFunction(RegexTokenCount.info)
    ext.injectFunction(TextStats.info)
    ext.injectFunction(MinHashSigs.info)
    ext.injectFunction(TokenHashes60.info)
    ext.injectFunction(RepetitionStats.info)
    ext.injectFunction(RepetitionStats.info4)
    ext.injectFunction(ArraySumAgg.info)
    ext.injectFunction(ContainedCount.info)
    ext.injectFunction(ManhattanDistance.info)
    ext.injectFunction(HashEmbedCounts.info)
    ext.injectFunction(SortedLongContains.info)
    ext.injectFunction(BpeApply.info)
    ext.injectFunction(AudioRms.info)
    ext.injectFunction(DeflateLen.info)
    ext.injectFunction(BottomKLongAgg.info)
    ext.injectFunction(BottomKStructAgg.info)
    ext.injectFunction(BloomContains.info)
    ext.injectFunction(TableSum.info)
    ext.injectFunction(GroupCdfRank.info)
    ext.injectFunction(CosineAnyAbove.info)
    ext.injectFunction(QgramHashes.info)
    ext.injectFunction(SortedInterAtLeast.info)
  }
}
