package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence-encoded character q-gram hashes — the token set of the
  * edit-distance similarity join ([[graft.dedup.EdJoin]]). Element i
  * is the 60-bit md5 hash of `gram ++ 0x01 ++ occ` where `gram` is the
  * q-char window starting at code point i (1-based SQL semantics) and
  * `occ` is the 1-based occurrence index of that gram within the
  * string so far. Encoding the occurrence makes the multiset of grams
  * a SET of distinct tokens: the k-th copy of a repeated gram in one
  * string can only match the k-th copy in another, so a plain
  * equi-join on tokens counts the multiset intersection min(k_a, k_b)
  * — the quantity the q-gram count filter of Gravano et al. (VLDB'01)
  * bounds.
  *
  * One pass, one open-addressed count map per row; bit-identical to
  * the composed SQL chain `conv(substr(md5(concat(gram, char(1),
  * cast(occ as string))), 1, 15), 16, 10)` (spec-asserted), so the
  * DuckDB oracle computes the same tokens with `md5(gram || chr(1) ||
  * CAST(occ AS VARCHAR))` + a row_number window. Texts shorter than q
  * code points yield an empty array.
  */
case class QgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qgram_hashes requires (string, int literal), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_qgram_hashes"

  override def nullSafeEval(text: Any, q: Any): Any =
    QgramHashes.compute(text.asInstanceOf[UTF8String], q.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, q) =>
      s"${ev.value} = graft.functions.QgramHashes$$.MODULE$$.compute($t, $q);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QgramHashes =
    copy(left = newLeft, right = newRight)
}

object QgramHashes {

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 md5 hex chars of `gram ++ 0x01 ++ occ-as-decimal` as a
    * 60-bit value, from digest bytes (7 bytes << 4 | high nibble of
    * byte 8) — identical to the hex-string parse.
    */
  def tokenHash(gram: UTF8String, occ: Int): Long = {
    val md = digestLocal.get()
    md.reset()
    md.update(gram.getBytes)
    md.update(0x01.toByte)
    md.update(String.valueOf(occ).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(text: UTF8String, q: Int): ArrayData = {
    require(q >= 1, s"graft_qgram_hashes: q must be >= 1, got $q")
    val n = text.numChars()
    if (n < q) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - q + 1)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < n - q + 1) {
      // substringSQL is the exact kernel behind substr(t, i, q):
      // code-point windows, not UTF-16
      val gram = text.substringSQL(i + 1, q)
      val occ = counts.merge(gram, 1, (a, _) => a + 1)
      out(i) = tokenHash(gram, occ)
      i += 1
    }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_qgram_hashes"),
    new ExpressionInfo(classOf[QgramHashes].getName, "graft_qgram_hashes"),
    (children: Seq[Expression]) => QgramHashes(children(0), children(1)): Expression)
}
