package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native k-permutation MinHash signature over a shingle-hash array:
  * `[min_i((A_i*h + B_i) mod (2^61-1)) for i < k]` in ONE pass over the
  * hashes — the SQL formulation is k separate interpreted
  * `array_min(transform(hs, ...))` lambda folds over the same array
  * (one closure call per shingle per permutation). Pure integer
  * arithmetic (products < 2^62), bit-identical to the SQL form
  * (spec-asserted), so the DuckDB oracle is untouched.
  *
  * Empty input yields NULL (callers filter empty shingle sets first,
  * matching [[graft.dedup.MinHash.signatures]]).
  */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sigs requires (array<bigint>, int literal), got $l, $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"
  override def nullable: Boolean = true

  override def nullSafeEval(hs: Any, k: Any): Any =
    MinHashSigs.compute(hs.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (hs, k) => {
      val tmp = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.MinHashSigs$$.MODULE$$.compute($hs, $k);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

object MinHashSigs {
  val Mersenne61 = 2305843009213693951L // 2^61 - 1

  /** Deterministic permutation constants (A_i odd, < 2^29; B_i < 2^31) —
    * the single source of truth [[graft.dedup.MinHash.permConsts]]
    * delegates to.
    */
  def permConsts(i: Int): (Long, Long) =
    ((48271L * (i + 1) * 2 + 1) % (1L << 29), (2654435761L * (i + 1)) % (1L << 31))

  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) { val (a, b) = permConsts(i); as(i) = a; bs(i) = b; i += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % Mersenne61
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  val info = (
    FunctionIdentifier("graft_minhash_sigs"),
    new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
    (children: Seq[Expression]) => MinHashSigs(children(0), children(1)): Expression)
}
