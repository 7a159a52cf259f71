package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * compression-ratio quality signal of the Gopher/RefinedWeb family:
  * `deflate_len / raw_len` sits around 0.4-0.7 for natural prose and
  * collapses toward 0 for template spam and repeated boilerplate
  * (the catch-all repetition proxy that n-gram fractions
  * ([[RepetitionStats]]) approximate feature by feature).
  *
  * No DuckDB twin exists (no zlib surface), so operators built on this
  * are SPEC-covered library surface (the Sketches precedent), not
  * oracle-registered queries. Determinism: java.util.zip wraps zlib
  * with fixed strategy/level, so the length is stable for a given JDK
  * level across executors of one cluster — and the SIGNAL (relative
  * ordering) is robust even across zlib builds.
  *
  * The Deflater is native-backed and allocation-heavy; one instance
  * per thread is cached and `reset()` between rows (an Expression
  * cannot carry per-partition state — the ThreadLocal is the
  * map-partitions-amortization equivalent for codegen).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires string, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateLen$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    val buf = bufLocal.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  val info = (
    FunctionIdentifier("graft_deflate_len"),
    new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
    (children: Seq[Expression]) => DeflateLen(children.head): Expression)
}
