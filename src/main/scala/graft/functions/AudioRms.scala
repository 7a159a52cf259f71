package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-frame RMS energies over an 8-bit-sample payload —
  * bit-identical to [[graft.multimodal.Multimodal.audioEnergyLambda]]
  * (the `transform`/`aggregate` formulation the DuckDB oracle mirrors,
  * spec-asserted): frame f covers code points [f·frameSize,
  * min((f+1)·frameSize, n)); rms = round(sqrt(Σ cp² / n_f), 4).
  *
  * Why a custom Expression: the lambda form evaluates one interpreted
  * `substr` + `ascii` expression tree per SAMPLE (and `substr` on a
  * UTF8String re-seeks from the string start, quadratic per frame).
  * This kernel decodes the UTF-8 code points in ONE forward byte pass
  * with no allocation beyond the output array. Rounding uses the same
  * BigDecimal HALF_UP Spark's `round` applies.
  */
case class AudioRms(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val f = right.eval()
        if (f != null && f.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_audio_rms requires frameSize >= 1, got $f")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_audio_rms requires (string, foldable int), got $other")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_audio_rms"

  override def nullSafeEval(payload: Any, frameSize: Any): Any =
    AudioRms.compute(payload.asInstanceOf[UTF8String], frameSize.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, f) =>
      s"${ev.value} = graft.functions.AudioRms$$.MODULE$$.compute($p, $f);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioRms =
    copy(left = newLeft, right = newRight)
}

object AudioRms {

  /** One forward pass: decode each UTF-8 code point, accumulate the
    * squared value per frame (exact integer sums), emit the rounded
    * RMS at each frame boundary.
    */
  def compute(payload: UTF8String, frameSize: Int): ArrayData = {
    val nBytes = payload.numBytes
    if (nBytes == 0) return new GenericArrayData(Array.empty[Any])
    val nCp = payload.numChars() // code points
    val nFrames = (nCp + frameSize - 1) / frameSize
    val out = new Array[Any](nFrames)
    var byteI = 0
    var cpI = 0
    var frame = 0
    var sumSq = 0L
    var inFrame = 0
    while (byteI < nBytes) {
      val b = payload.getByte(byteI)
      var cp = 0
      if ((b & 0x80) == 0) { cp = b; byteI += 1 }
      else {
        // multi-byte sequence: length from the lead byte, code point
        // assembled from the continuation payloads
        var len = 2
        var mask = 0x1F
        if ((b & 0xE0) == 0xC0) { len = 2; mask = 0x1F }
        else if ((b & 0xF0) == 0xE0) { len = 3; mask = 0x0F }
        else { len = 4; mask = 0x07 }
        cp = b & mask
        var k = 1
        while (k < len && byteI + k < nBytes) {
          cp = (cp << 6) | (payload.getByte(byteI + k) & 0x3F)
          k += 1
        }
        byteI += len
      }
      sumSq += cp.toLong * cp
      inFrame += 1
      cpI += 1
      if (inFrame == frameSize || cpI == nCp) {
        val rms = math.sqrt(sumSq.toDouble / inFrame)
        out(frame) = java.math.BigDecimal.valueOf(rms)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        frame += 1
        sumSq = 0L
        inFrame = 0
      }
    }
    new GenericArrayData(out)
  }

  val info = (
    FunctionIdentifier("graft_audio_rms"),
    new ExpressionInfo(classOf[AudioRms].getName, "graft_audio_rms"),
    (children: Seq[Expression]) => AudioRms(children(0), children(1)): Expression)
}
