package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen Bloom-filter membership probe — the kernel behind
  * [[graft.ops.Sketches.mightContain]] and the streaming n-gram
  * decontamination gate.
  *
  * Why a custom Expression: the probe is THE map-only pre-filter on
  * corpus-wide paths (Bloom-prefiltered joins, train/eval
  * decontamination at 100 TB), and Spark exposes no public built-in
  * for it — its internal `BloomFilterMightContain` is reserved for the
  * runtime-filter framework. A boxed Scala UDF there costs a
  * primitive→object round trip per row and drops out of whole-stage
  * codegen; this expression evaluates `mightContainLong` /
  * `mightContainBinary` directly inside the generated loop.
  *
  * Shape follows [[SortedLongContains]]: the filter rides as a
  * FOLDABLE binary literal child (`BloomFilter.writeTo` bytes — the
  * same trick Spark's runtime filters use), deserialized once per
  * task at codegen/eval setup and referenced as a plain object — no
  * broadcast round-trip needed for the MB-scale filters buildBloom
  * produces, and the expression stays a pure function of its children
  * (plan-cache and PlanAudit friendly).
  *
  * Probe semantics per resolved value type (the representation
  * [[graft.ops.Sketches.buildBloom]] inserted — a silent cast would
  * produce FALSE NEGATIVES, the one failure mode a Bloom pre-filter
  * must never have):
  *  - bigint → `mightContainLong`
  *  - string → `mightContainBinary(utf8 bytes)` (= `mightContainString`)
  *  - array<bigint> → true iff ANY non-null element hits (the
  *    streaming decontamination gate's per-doc n-gram probe)
  * Null input → null (callers that need the legacy UDFs' false-on-null
  * coalesce explicitly); null array ELEMENTS never hit.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val valueOk = left.dataType match {
      case LongType | StringType => true
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (valueOk && right.dataType == BinaryType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (bigint|string|array<bigint>, " +
        s"binary literal of BloomFilter.writeTo bytes), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // deserialized once per (de)serialized instance from the foldable
  // literal — the SortedLongContains pattern
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      right.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(v: Any, ignored: Any): Any = left.dataType match {
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    case StringType =>
      bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case ArrayType(LongType, _) =>
      val ad = v.asInstanceOf[ArrayData]
      val n = ad.numElements()
      var i = 0
      var hit = false
      while (!hit && i < n) {
        if (!ad.isNullAt(i)) hit = bloom.mightContainLong(ad.getLong(i))
        i += 1
      }
      hit
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    left.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, (v, _) =>
          s"${ev.value} = $ref.mightContainLong($v);")
      case StringType =>
        nullSafeCodeGen(ctx, ev, (v, _) =>
          s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
      case ArrayType(LongType, _) =>
        nullSafeCodeGen(ctx, ev, (v, _) => {
          val i = ctx.freshName("i")
          val n = ctx.freshName("n")
          s"""
             |int $n = $v.numElements();
             |${ev.value} = false;
             |for (int $i = 0; !${ev.value} && $i < $n; $i++) {
             |  if (!$v.isNullAt($i)) {
             |    ${ev.value} = $ref.mightContainLong($v.getLong($i));
             |  }
             |}
           """.stripMargin
        })
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  val info = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
    (children: Seq[Expression]) => BloomContains(children(0), children(1)): Expression)

  /** Serialized filter bytes for the binary-literal child. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Column-side probe: `graft_bloom_contains(value, <filter bytes>)`.
    * The caller's session must have the graft kernels registered
    * ([[DotProduct.register]] — Tables.df / GraftExtensions do).
    */
  def probe(value: Column, bloom: BloomFilter): Column =
    call_function("graft_bloom_contains", value, lit(serialize(bloom)))
}
