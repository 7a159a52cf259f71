package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stopword-marker language identification — the classic n-gram/stopword
  * heuristic: count tokens hitting each language's high-frequency marker
  * list and take the argmax (deterministic tie-break by list order,
  * `und` when no marker hits). Pure Catalyst expression, one scan; the
  * same formula is emitted as DuckDB SQL for the oracle.
  */
object LangId {

  /** (language code, marker stopwords). Order = tie-break priority. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "que", "por", "con", "para"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => array_contains(array(words.map(lit): _*), x)))

  /** Score columns (one per language) for a token-array column. */
  def scores(toks: Column): Seq[(String, Column)] =
    markers.map { case (code, words) => code -> hitCount(toks, words) }

  /** Predicted language: argmax of marker hits, `und` if all zero. */
  def predict(toks: Column): Column = {
    val ss = scores(toks)
    val best = greatest(ss.map(_._2): _*)
    ss.foldRight(lit("und")) { case ((code, s), acc) =>
      when(s === best && best > 0, lit(code)).otherwise(acc)
    }
  }

  // `predict` resolves ties by taking the FIRST language (in `markers`
  // order) whose score equals the max — foldRight makes earlier entries
  // win. The Duck SQL mirrors that with an ordered CASE.

  def predictDuckSql(toksSql: String): String = {
    def arr(words: Seq[String]) = words.map(w => s"'$w'").mkString("[", ", ", "]")
    def hits(words: Seq[String]) = s"len(list_filter($toksSql, x -> list_contains(${arr(words)}, x)))"
    val scoreExprs = markers.map { case (code, words) => code -> hits(words) }
    val best = scoreExprs.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scoreExprs.map { case (code, s) =>
      s"WHEN $s = $best AND $best > 0 THEN '$code'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }
}
