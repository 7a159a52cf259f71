package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hashes of the DISTINCT whitespace tokens of a
  * string, in first-occurrence order — the one-pass twin of
  * `transform(array_distinct(split(t,' ')), t -> cast(conv(substr(
  * md5(t),1,15),16,10) as bigint))` ([[graft.dedup.SimHash]]), which
  * runs the md5 chain as an interpreted lambda per token. The 60-bit
  * value is reconstructed from digest BYTES (7 bytes << 4 | high
  * nibble of byte 8 == first 15 hex chars), identical to the hex-string
  * parse. Bit-identical to the SQL form (spec-asserted), so the DuckDB
  * oracle is untouched.
  */
case class TokenHashes60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes60 requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes60"

  override def nullSafeEval(input: Any): Any =
    TokenHashes60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenHashes60$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes60 =
    copy(child = newChild)
}

object TokenHashes60 {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 md5 hex chars as a 60-bit value, from digest bytes. */
  def hash60(tok: UTF8String): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(text: UTF8String): GenericArrayData = {
    // Spark's split(t, ' ') is a regex split with limit -1; UTF8String
    // .split replicates it. array_distinct keeps first occurrence.
    val toks = text.split(UTF8String.fromString(" "), -1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = hash60(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_token_hashes60"),
    new ExpressionInfo(classOf[TokenHashes60].getName, "graft_token_hashes60"),
    (children: Seq[Expression]) => TokenHashes60(children.head): Expression)
}
