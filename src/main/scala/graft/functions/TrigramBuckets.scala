package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-trigram bucket array of lower(text) — the one-pass twin
  * of the indexer's explode(positions) -> substr -> md5 -> conv chain
  * ([[graft.index.TrigramIndexer.index]]): one row-level call computes
  * every occurrence's bucket
  * (`pmod(conv(substr(md5(tri),1,15),16,10), dim)`) as a primitive
  * array, which the caller explodes directly.
  *
  * The 60-bit value of the first 15 md5 hex chars is reconstructed from
  * digest BYTES (7 bytes << 4 | high nibble of byte 8) — identical to
  * the hex-string parse, without materializing hex. Empty/short texts
  * (< 3 chars) yield an empty array, matching the SQL guard. Integer
  * arithmetic only: bit-identical to the SQL form (spec-asserted), so
  * the DuckDB oracle is untouched.
  */
case class TrigramBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_buckets requires (string, int literal), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_trigram_buckets"

  override def nullSafeEval(text: Any, dim: Any): Any =
    TrigramBuckets.compute(text.asInstanceOf[UTF8String], dim.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.TrigramBuckets$$.MODULE$$.compute($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramBuckets =
    copy(left = newLeft, right = newRight)
}

object TrigramBuckets {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Bucket of one trigram: first 15 md5 hex chars as a 60-bit value,
    * mod dim.
    */
  def bucketOf(tri: UTF8String, dim: Int): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(tri.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    v % dim
  }

  def compute(text: UTF8String, dim: Int): ArrayData = {
    // toLowerCase + substringSQL are the EXACT kernels behind Spark's
    // lower() and substr(t, i, 3) — code-point windows, not UTF-16
    val t = text.toLowerCase
    val n = t.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = bucketOf(t.substringSQL(i + 1, 3), dim)
      i += 1
    }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_trigram_buckets"),
    new ExpressionInfo(classOf[TrigramBuckets].getName, "graft_trigram_buckets"),
    (children: Seq[Expression]) => TrigramBuckets(children(0), children(1)): Expression)
}
