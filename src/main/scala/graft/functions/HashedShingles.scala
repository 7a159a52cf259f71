package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native integer w-shingle hashing of a text column — the one-pass
  * twin of [[graft.text.TextFunctions.hashedShinglesSql]], which runs
  * as interpreted transform/aggregate lambdas (one closure call per
  * token and per shingle). Pipeline per row, all in primitive code:
  *
  *   1. whitespace tokens (same regex-split semantics as `split(t,' ')`)
  *   2. 31-bit md5 token hash: first 8 md5 hex chars as unsigned int,
  *      mod 2^31-1 (== `conv(substr(md5(tok),1,8),16,10) % 2147483647`)
  *   3. polynomial w-window hash mod 2^31-1
  *   4. first-occurrence dedup (== `array_distinct` ordering)
  *
  * Integer arithmetic throughout, so results are BIT-IDENTICAL to the
  * SQL form (spec-asserted) and the DuckDB oracle is unaffected.
  */
case class HashedShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_shingles requires (string, int literal), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(text: Any, w: Any): Any =
    HashedShingles.compute(text.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.HashedShingles$$.MODULE$$.compute($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedShingles =
    copy(left = newLeft, right = newRight)
}

object HashedShingles {
  val ShingleMod = 2147483647L
  val ShinglePrime = 1000003L

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 31-bit md5 token hash: first 4 digest bytes big-endian unsigned
    * (= first 8 hex chars) mod 2^31-1.
    */
  def tokenHash(tok: UTF8String): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u % ShingleMod
  }

  def compute(text: UTF8String, w: Int): ArrayData = {
    // Spark's split(t, ' ') is a regex split with limit -1 (keeps
    // trailing empty strings); UTF8String.split replicates it exactly
    val toks = text.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(toks(i)); i += 1 }
    // polynomial w-window hashes, first-occurrence dedup
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - w) {
      var acc = 0L
      var j = 0
      while (j < w) {
        acc = (acc * ShinglePrime + hs(i + j)) % ShingleMod
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_hashed_shingles"),
    new ExpressionInfo(classOf[HashedShingles].getName, "graft_hashed_shingles"),
    (children: Seq[Expression]) => HashedShingles(children(0), children(1)): Expression)
}
