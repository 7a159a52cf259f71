package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-ish token count: the number of matches of
  * `[a-z]+|[0-9]+|[^a-z0-9 ]` in the input string — equivalent to
  * `size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`
  * (callers lowercase first, as [[graft.text.TextFunctions.regexTokens]]
  * does).
  *
  * Why a custom Expression: the regex form materializes an array of
  * UTF8String slices per document just to take its size — regex engine
  * plus one allocation per token. This expression scans the UTF-8
  * BYTES once with no allocation: a letter/digit run counts once at
  * its first byte, a space skips, and any other code point counts
  * once (multi-byte lead bytes are negative, so they fall to the
  * "other" branch; continuation bytes 10xxxxxx are skipped — exactly
  * one count per code point, matching the regex's per-code-point
  * semantics). Spec-asserted equivalent to the regex form, so the
  * DuckDB oracle is untouched.
  */
case class RegexTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_re_token_count requires string, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_re_token_count"

  override def nullSafeEval(input: Any): Any =
    RegexTokenCount.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RegexTokenCount$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): RegexTokenCount =
    copy(child = newChild)
}

object RegexTokenCount {

  /** One pass over the UTF-8 bytes; see class doc for the contract. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var cnt = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') {
        cnt += 1; i += 1
        while (i < n && { val c = s.getByte(i); c >= 'a' && c <= 'z' }) i += 1
      } else if (b >= '0' && b <= '9') {
        cnt += 1; i += 1
        while (i < n && { val c = s.getByte(i); c >= '0' && c <= '9' }) i += 1
      } else if (b == ' ') {
        i += 1
      } else {
        // any other code point: count once, skip its continuation bytes
        cnt += 1; i += 1
        while (i < n && (s.getByte(i) & 0xC0) == 0x80) i += 1
      }
    }
    cnt
  }

  val info = (
    FunctionIdentifier("graft_re_token_count"),
    new ExpressionInfo(classOf[RegexTokenCount].getName, "graft_re_token_count"),
    (children: Seq[Expression]) => RegexTokenCount(children.head): Expression)
}
