package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Graded prediction evaluation (reference:
  * src/linkml_store/inference/evaluation.py — score_match :15-80,
  * Outcome :82-88, evaluate_predictor :90-124, score_text_overlap
  * :127-145, find_longest_overlap :146-169): partial-credit scoring of
  * predicted vs expected objects, beyond [[Rules.accuracy]]'s exact
  * match.
  *
  * Score semantics (mirrored from the reference exactly):
  *  - equal values → 1.0; exactly one null → 0.0; both null → 1.0
  *  - lists: all-by-all score matrix, then bidirectional best-match
  *    average: (Σ row-max + Σ col-max) / (|target| + |candidate|)
  *  - maps/structs: union of keys, mean of per-key scores (a key
  *    absent on both sides scores 1.0 — None == None)
  *  - mismatched leaves: the pluggable match function, else 0.0
  *
  * [[evaluatePredictor]] is the distributed tier: the score runs as a
  * typed map over (predicted, expected) column pairs — each row
  * scores independently, so a 10⁹-row eval set scores with no
  * shuffle and one 2-value final aggregate. The reference instead
  * loops rows on the driver with a default cap of 10.
  */
object Evaluation {

  type MatchFn = (Any, Any) => Double

  /** Longest common substring and its length (reference
    * find_longest_overlap — case-sensitive, empty on no overlap).
    * Classic O(|a|·|b|) DP with a rolling row.
    */
  def findLongestOverlap(a: String, b: String): (String, Int) = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return ("", 0)
    var best = 0
    var endA = 0
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        if (a.charAt(i - 1) == b.charAt(j - 1)) {
          cur(j) = prev(j - 1) + 1
          if (cur(j) > best) { best = cur(j); endA = i }
        } else cur(j) = 0
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    (a.substring(endA - best, endA), best)
  }

  /** Longest-common-substring overlap ratio (reference
    * score_text_overlap): |overlap| / max(|a|, |b|); equal strings
    * 1.0, null/empty 0.0.
    */
  def scoreTextOverlap(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    findLongestOverlap(a, b)._1.length.toDouble / math.max(a.length, b.length)
  }

  /** The text-overlap leaf matcher in [[MatchFn]] shape (reference
    * cli.py:880 exposes it by name for `infer --evaluate`).
    */
  val textOverlapFn: MatchFn = {
    case (a: String, b: String) => scoreTextOverlap(a, b)
    case (a, b) => scoreTextOverlap(String.valueOf(a), String.valueOf(b))
  }

  /** Normalize Spark-facing values so structural comparison sees one
    * shape: Row→Map by field name, java maps/lists→Scala. Numeric
    * leaves keep their original type — [[scoreMatch]] compares them
    * by value (Python's 1 == 1.0), but a pluggable match function
    * must see str(12) = "12", not "12.0".
    */
  private def norm(v: Any): Any = v match {
    case null => null
    case r: Row =>
      Option(r.schema) match {
        case Some(sch) => sch.fieldNames.iterator.zipWithIndex
          .map { case (f, i) => f -> norm(r.get(i)) }.toMap
        case None => r.toSeq.map(norm).toList
      }
    case m: scala.collection.Map[_, _] =>
      m.iterator.map { case (k, mv) => String.valueOf(k) -> norm(mv) }.toMap
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.iterator.map { case (k, mv) => String.valueOf(k) -> norm(mv) }.toMap
    case xs: scala.collection.Seq[_] => xs.map(norm).toList
    case xs: Array[_] => xs.map(norm).toList
    case xs: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      xs.asScala.map(norm).toList
    case other => other
  }

  /** Python-style cross-type numeric equality (1 == 1.0). */
  private def numEq(t: Any, c: Any): Boolean = (t, c) match {
    case (a: java.lang.Number, b: java.lang.Number) => a.doubleValue == b.doubleValue
    case _ => false
  }

  /** Structural partial-credit score of candidate vs target (reference
    * score_match; see the object doc for the exact semantics).
    */
  def scoreMatch(target: Any, candidate: Any, matchFn: Option[MatchFn] = None): Double = {
    def go(t: Any, c: Any): Double = {
      if (t == c || numEq(t, c)) return 1.0
      if (t == null || c == null) return 0.0
      (t, c) match {
        case (ts: List[_], cs: List[_]) =>
          if (ts.isEmpty || cs.isEmpty) return 0.0 // unequal, one empty
          val m = Array.ofDim[Double](ts.length, cs.length)
          for (i <- ts.indices; j <- cs.indices) m(i)(j) = go(ts(i), cs(j))
          val rowMax = ts.indices.map(i => cs.indices.map(m(i)).max).sum
          val colMax = cs.indices.map(j => ts.indices.map(i => m(i)(j)).max).sum
          (rowMax + colMax) / (ts.length + cs.length)
        case (tm: Map[String, _] @unchecked, cm: Map[String, _] @unchecked) =>
          val keys = tm.keySet ++ cm.keySet
          if (keys.isEmpty) 1.0
          else keys.iterator.map(k => go(tm.getOrElse(k, null), cm.getOrElse(k, null))).sum / keys.size
        case _ => matchFn.map(f => f(t, c)).getOrElse(0.0)
      }
    }
    go(norm(target), norm(candidate))
  }

  /** Reference Outcome: graded true-positive mass over total rows. */
  final case class Outcome(truePositive: Double, total: Long) {
    def accuracy: Double = if (total == 0) 0.0 else truePositive / total
  }

  /** Distributed evaluate_predictor over an already-predicted frame:
    * scores `predictedCol` against `expectedCol` per row (any column
    * type — scalar, struct, array) and aggregates one Outcome. Rows
    * score independently in a typed map; only the final (sum, count)
    * pair reaches the driver.
    */
  def evaluatePredictor(df: DataFrame, predictedCol: String, expectedCol: String,
                        matchFn: Option[MatchFn] = None): Outcome = {
    val scored = df.select(col(predictedCol), col(expectedCol))
      .map(r => scoreMatch(r.get(0), r.get(1), matchFn))(Encoders.scalaDouble)
    val agg = scored.agg(sum(col("value")).as("tp"), count(lit(1)).as("n")).head()
    Outcome(if (agg.isNullAt(0)) 0.0 else agg.getDouble(0), agg.getLong(1))
  }
}
