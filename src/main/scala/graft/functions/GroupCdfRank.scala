package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-group avg-rank CDF lookup against a FOLDABLE binary-encoded
  * model — the serve-time quantile-normalization kernel behind
  * [[graft.streaming.StreamOps.quantileNormalizeStream]]. Children:
  * (group string, cent-value bigint, model binary literal).
  *
  * The model is the per-group compressed value histogram the batch
  * [[graft.ops.EventFeatures.quantileNormalize]] fits: per group a
  * sorted cent-value grid `qvs` and its exclusive cumulative counts
  * `cum` (cum(i) = corpus values strictly below qvs(i); cum(len) = n).
  * Lookup is a binary search + the exact PortableRound integer
  * average-rank formula — bit-identical to the boxed UDF this kernel
  * replaces (spec-pinned), evaluated as a primitive search over
  * plan-carried `long[]`s inside whole-stage codegen:
  *   hit  at idx → p = cum(idx) + cum(idx+1) + 1
  *   miss at ins → p = 2·cum(ins) + 1
  *   q = 2·(n + 1);  qn = ((20000·p + q) / (2·q)) / 10000.0
  * An unseen group yields null (no distribution to normalize against);
  * null group/value propagate null.
  *
  * Model bytes come from [[GroupCdfRank.encode]] (DataOutputStream,
  * deterministic layout) — bounded driver state by the fit contract
  * (the compressed histogram is capped by the value domain), riding
  * the plan as a foldable literal like [[BloomContains]]'s filter.
  */
case class GroupCdfRank(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == LongType &&
        third.dataType == BinaryType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdf_rank requires (string, bigint, binary model literal), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdf_rank"

  @transient private lazy val model: java.util.HashMap[String, (Array[Long], Array[Long])] =
    GroupCdfRank.decode(third.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(g: Any, qv: Any, ignored: Any): Any =
    GroupCdfRank.lookup(model, g.asInstanceOf[UTF8String].toString,
      qv.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdfModel", model,
      classOf[java.util.HashMap[String, (Array[Long], Array[Long])]].getName)
    nullSafeCodeGen(ctx, ev, (g, qv, _) => {
      val r = ctx.freshName("r")
      // lookup returns a boxed Double or null (unseen group) — the
      // generated code forwards the null through ev.isNull
      s"""
         |Object $r = graft.functions.GroupCdfRank.lookup($ref, $g.toString(), $qv);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GroupCdfRank =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GroupCdfRank {
  val info = (
    FunctionIdentifier("graft_cdf_rank"),
    new ExpressionInfo(classOf[GroupCdfRank].getName, "graft_cdf_rank"),
    (children: Seq[Expression]) => GroupCdfRank(children(0), children(1), children(2)): Expression)

  /** Shared by interpreted eval and generated code: boxed Double, or
    * null for an unseen group.
    */
  def lookup(model: java.util.HashMap[String, (Array[Long], Array[Long])],
             g: String, qv: Long): java.lang.Double = {
    val entry = model.get(g)
    if (entry == null) return null
    val (qvs, cum) = entry
    val idx = java.util.Arrays.binarySearch(qvs, qv)
    val p = if (idx >= 0) cum(idx) + cum(idx + 1) + 1
            else 2L * cum(-idx - 1) + 1
    val q = 2L * (cum(qvs.length) + 1)
    java.lang.Double.valueOf(((20000L * p + q) / (2L * q)).toDouble / 10000.0)
  }

  /** Deterministic model layout: [nGroups] then per group
    * [utf8 group][len][qvs…][cum… (len+1 entries)].
    */
  def encode(model: Map[String, (Array[Long], Array[Long])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(model.size)
    model.toSeq.sortBy(_._1).foreach { case (g, (qvs, cum)) =>
      require(cum.length == qvs.length + 1,
        s"cum must carry ${qvs.length + 1} entries (exclusive prefix + total), got ${cum.length}")
      out.writeUTF(g)
      out.writeInt(qvs.length)
      qvs.foreach(out.writeLong)
      cum.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): java.util.HashMap[String, (Array[Long], Array[Long])] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, (Array[Long], Array[Long])](n * 2)
    var i = 0
    while (i < n) {
      val g = in.readUTF()
      val len = in.readInt()
      val qvs = Array.fill(len)(in.readLong())
      val cum = Array.fill(len + 1)(in.readLong())
      m.put(g, (qvs, cum))
      i += 1
    }
    m
  }
}
