package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text statistics over the RAW text bytes:
  * `[n_chars, n_spaces, n_punct, n_digits, n_stop_tokens]`, where
  *  - n_chars  = code points (== Spark `length`),
  *  - n_spaces = ' ' count (whitespace tokens = n_spaces + 1),
  *  - n_punct  = code points outside [a-z0-9 ] (== length minus
  *    length(regexp_replace(text,'[a-z0-9 ]',''))-complement),
  *  - n_digits = [0-9] count,
  *  - n_stop   = whitespace tokens equal to a
  *    [[graft.text.TextFunctions.stopwords]] entry (byte compare).
  *
  * Why a custom Expression: the quality-score formulas otherwise cost
  * two regex passes (punct/digit) plus three interpreted lambda folds
  * (mean token length, stopword filter) per document. Everything those
  * formulas derive from is one scan of the bytes; per-row cost drops
  * to memory bandwidth and the derived ratios stay bit-identical
  * (integer counts, same divisions — spec-asserted), so the DuckDB
  * oracle formulas are untouched. Multi-byte code points: lead byte
  * counts (one per code point, never in the ascii classes),
  * continuation bytes are skipped.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextStats$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  private val StopBytes: Array[Array[Byte]] =
    graft.text.TextFunctions.stopwords.map(_.getBytes("UTF-8")).toArray

  private def isStop(s: UTF8String, start: Int, end: Int): Boolean = {
    val len = end - start
    var w = 0
    while (w < StopBytes.length) {
      val sw = StopBytes(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && s.getByte(start + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  def compute(s: UTF8String): GenericArrayData = {
    val n = s.numBytes
    var chars = 0L; var spaces = 0L; var punct = 0L; var digits = 0L; var stops = 0L
    var tokStart = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) == 0x80) {
        // continuation byte: part of the lead's code point
        i += 1
      } else {
        chars += 1
        if (b == ' ') {
          spaces += 1
          if (isStop(s, tokStart, i)) stops += 1
          tokStart = i + 1
        } else if (b >= '0' && b <= '9') {
          digits += 1
        } else if (!(b >= 'a' && b <= 'z')) {
          punct += 1
        }
        i += 1
      }
    }
    if (isStop(s, tokStart, n)) stops += 1
    new GenericArrayData(Array(chars, spaces, punct, digits, stops))
  }

  val info = (
    FunctionIdentifier("graft_text_stats"),
    new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
    (children: Seq[Expression]) => TextStats(children.head): Expression)
}
