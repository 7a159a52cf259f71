package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen THRESHOLDED intersection count over two SORTED
  * `array<bigint>` columns: returns |a ∩ b| when it is >= `needed`,
  * and -1 as soon as the merge walk can PROVE the intersection cannot
  * reach `needed` (matches so far + min(remaining_a, remaining_b) <
  * needed). Both inputs must be sorted ascending with any null slots
  * last (`array_sort` produces exactly this); elements are distinct
  * within each array on every call site (occurrence-encoded q-grams),
  * so the merge count IS the multiset intersection.
  *
  * This is the Ed-Join count-filter kernel. The verify threshold
  * there is max(|Ga|,|Gb|) − q·d — within q·d+|len diff| of the whole
  * array — so for the overwhelming majority of candidates (dissimilar
  * strings that merely collided on one rare prefix gram) the walk
  * aborts after ~q·d mismatches instead of hash-building and probing
  * both full gram arrays: measured 5.47M candidate pairs → 1.8k
  * survivors at sf1, where [[ContainedCount]]'s per-pair
  * HashSet(build |Gb|) + probe(|Ga|) was the query's dominant stage.
  * Survivors pay one full merge walk — still allocation-free and
  * cheaper than the hash form.
  *
  * Early abort only ever returns -1 when the true count is provably
  * < needed, and the caller filters on `result >= needed`, so the
  * selected pair set is EXACTLY the count-filter's (the oracle twin
  * keeps its independent full-count formulation).
  */
case class SortedInterAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (arraysOk && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_inter_at_least requires (array<bigint>, array<bigint>, int), " +
        s"got ${first.dataType}, ${second.dataType}, ${third.dataType}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_inter_at_least"

  // null SLOTS sort last under array_sort: the merge stops at the first
  // null slot on either side (no non-null element can match past it and
  // nulls never match), identical to ContainedCount's skip semantics.
  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val needed = n.asInstanceOf[Int]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i) || y.isNullAt(j)) { i = na; j = nb }
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { cnt += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
        val rem = math.min(na - i, nb - j)
        if (cnt + rem < needed) return -1
      }
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, n) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val rem = ctx.freshName("rem")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $na = $x.numElements();
         |final int $nb = $y.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { $i = $na; $j = $nb; break; }
         |  final long $xv = $x.getLong($i);
         |  final long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |  final int $rem = Math.min($na - $i, $nb - $j);
         |  if ($cnt + $rem < $n) { $cnt = -1; break; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedInterAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedInterAtLeast {
  val info = (
    FunctionIdentifier("graft_sorted_inter_at_least"),
    new ExpressionInfo(classOf[SortedInterAtLeast].getName, "graft_sorted_inter_at_least"),
    (children: Seq[Expression]) =>
      SortedInterAtLeast(children(0), children(1), children(2)): Expression)
}
