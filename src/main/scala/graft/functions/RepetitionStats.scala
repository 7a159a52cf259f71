package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Gopher-style repetition stats:
  * `[dup_token_frac, dup_2gram_frac, dup_3gram_frac, top_2gram_frac]`
  * (see [[graft.text.Repetition]] for the definitions and the DuckDB
  * oracle; the HOF formulations there remain as the spec-asserted
  * reference twins).
  *
  * Why a custom Expression: the higher-order-function formulation is
  * interpreted, and interpreted lambdas re-evaluate their whole child
  * subtree on every iteration — `element_at(array_sort(ngrams(..)), i)`
  * inside an `aggregate` over run boundaries re-tokenizes, re-builds
  * and re-sorts the gram array once per boundary per access, which is
  * super-quadratic per document and measured in MINUTES on the sf0.1
  * corpus. This kernel tokenizes once and counts grams in hash maps:
  * O(total chars) per row, all four stats from one pass, bit-identical
  * divisions (integer char counts, same operation order), so the
  * DuckDB oracle is untouched.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats requires string, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepetitionStats$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** [[RepetitionStats]] with the four fractions pre-rounded to 4dp by
  * EXACT integer half-up arithmetic on the underlying rationals:
  * round4(p/q) = ⌊(20000·p + q) / (2·q)⌋ / 10000. Every stat here is a
  * ratio of integer char/token counts, and `round(double, 4)` is NOT
  * engine-portable on exact decimal boundaries — a doc with
  * best/len = 57/800 = 0.07125 rounds to 0.0713 under Spark's
  * BigDecimal(Double.toString) HALF_UP but 0.0712 under DuckDB's
  * binary-value rounding (the double is 0.0712499…96, just below the
  * boundary). Integer rounding of the true rational is identical in
  * both engines for ALL inputs, so the oracle twin mirrors the same
  * ⌊(20000p+q)/(2q)⌋ formula (surfaced at sf1: doc 600004885).
  */
case class RepetitionStats4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats4 requires string, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats4"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.computeRounded(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepetitionStats$$.MODULE$$.computeRounded($s);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats4 =
    copy(child = newChild)
}

object RepetitionStats {

  /** (dup frac, best count*charlen) over the w-grams of `toks`.
    * Gram char length counts CODE POINTS (== Spark `length`), grams are
    * space-joined, and "dup" weights every occurrence beyond a gram's
    * first by its char length — matching Repetition.dupNgramCharFrac /
    * top2gramCharFrac and the oracle's unnest+GROUP BY formulation.
    */
  private def gramStats(toks: Array[String], w: Int): (Double, Long) = {
    val (total, uniq, best) = gramCounts(toks, w)
    val frac = if (total == 0L) 0.0 else (total - uniq).toDouble / total.toDouble
    (frac, best)
  }

  /** Integer (total, uniq, best) char-weight counts over the w-grams —
    * the exact rationals behind [[gramStats]], consumed by the
    * integer-rounding [[computeRounded]] path.
    */
  private def gramCounts(toks: Array[String], w: Int): (Long, Long, Long) = {
    val n = toks.length
    if (n < w) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Array[Int]]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.get(sb.toString)
      if (c == null) counts.put(sb.toString, Array(1)) else c(0) += 1
      i += 1
    }
    var total = 0L
    var uniq = 0L
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val l = g.codePointCount(0, g.length).toLong
      val c = e.getValue()(0).toLong
      total += c * l
      uniq += l
      if (c * l > best) best = c * l
    }
    (total, uniq, best)
  }

  def compute(s: UTF8String): GenericArrayData = {
    val text = s.toString
    // split on single space, keeping empty tokens — same as Spark
    // split(text, ' ') and DuckDB string_split(text, ' ')
    val toks = text.split(" ", -1)
    val n = toks.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val dupTok = (n - distinct.size).toDouble / n.toDouble
    val (d2, best2) = gramStats(toks, 2)
    val (d3, _) = gramStats(toks, 3)
    val textLen = text.codePointCount(0, text.length)
    val t2 =
      if (n < 2 || textLen == 0) 0.0
      else best2.toDouble / textLen.toDouble
    new GenericArrayData(Array(dupTok, d2, d3, t2))
  }

  /** Exact 4dp half-up rounding of the rational p/q (p, q ≥ 0): no
    * double ever carries the unrounded value, so decimal-boundary
    * ratios round identically to the DuckDB twin's mirrored
    * ⌊(20000p+q)/(2q)⌋ integer formula. p ≤ total doc chars (~1e6)
    * keeps 20000·p far inside Long range.
    */
  def intRound4(p: Long, q: Long): Double =
    if (q == 0L) 0.0 else ((20000L * p + q) / (2L * q)) / 10000.0

  def computeRounded(s: UTF8String): GenericArrayData = {
    val text = s.toString
    val toks = text.split(" ", -1)
    val n = toks.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val (t2tot, t2uniq, best2) = gramCounts(toks, 2)
    val (t3tot, t3uniq, _) = gramCounts(toks, 3)
    val textLen = text.codePointCount(0, text.length).toLong
    new GenericArrayData(Array(
      intRound4((n - distinct.size).toLong, n.toLong),
      intRound4(t2tot - t2uniq, t2tot),
      intRound4(t3tot - t3uniq, t3tot),
      if (n < 2) 0.0 else intRound4(best2, textLen)))
  }

  val info = (
    FunctionIdentifier("graft_repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repetition_stats"),
    (children: Seq[Expression]) => RepetitionStats(children.head): Expression)

  val info4 = (
    FunctionIdentifier("graft_repetition_stats4"),
    new ExpressionInfo(classOf[RepetitionStats4].getName, "graft_repetition_stats4"),
    (children: Seq[Expression]) => RepetitionStats4(children.head): Expression)
}
