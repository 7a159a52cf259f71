package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass feature-hashing count vector — the codegen twin of
  * [[graft.text.HashEmbed]]'s lambda formulation
  * `transform(sequence(0, dim-1), b -> size(filter(bucketed, = b)))`,
  * which scans the token array once PER DIMENSION. This expression
  * tokenizes (lower + split-on-space, the exact `split` kernel
  * semantics including the empty-string token of an empty input),
  * hashes each token once (md5 60-bit, [[TrigramBuckets.bucketOf]]),
  * and increments a dim-length counts array — O(tokens + dim) per row
  * instead of O(tokens x dim), inside whole-stage codegen.
  *
  * Bit-identical to the SQL/lambda form (HashEmbedSpec asserts it), so
  * the DuckDB oracle is untouched.
  */
case class HashEmbedCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable) {
      // reject non-positive dim at ANALYSIS time (mirrors
      // HashEmbed.embed's require): a dim <= 0 literal would otherwise
      // pass analysis and die inside codegen with a bare
      // NegativeArraySizeException
      val dim = right.eval(null)
      if (dim == null || dim.asInstanceOf[Int] >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_hash_embed dim must be >= 1, got $dim")
    } else TypeCheckResult.TypeCheckFailure(
      s"graft_hash_embed requires (string, int literal), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override def nullSafeEval(text: Any, dim: Any): Any =
    HashEmbedCounts.compute(text.asInstanceOf[UTF8String], dim.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.HashEmbedCounts$$.MODULE$$.compute($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashEmbedCounts =
    copy(left = newLeft, right = newRight)
}

object HashEmbedCounts {

  def compute(text: UTF8String, dim: Int): ArrayData = {
    // Spark's split(t, ' ') is a regex split with limit -1; UTF8String
    // .split replicates it (an empty input yields one "" token, which
    // hashes like any other — matching the lambda form exactly)
    val toks = text.toLowerCase.split(UTF8String.fromString(" "), -1)
    val out = new Array[Int](dim)
    var i = 0
    while (i < toks.length) {
      out(TrigramBuckets.bucketOf(toks(i), dim).toInt) += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_hash_embed"),
    new ExpressionInfo(classOf[HashEmbedCounts].getName, "graft_hash_embed"),
    (children: Seq[Expression]) => HashEmbedCounts(children(0), children(1)): Expression)
}
