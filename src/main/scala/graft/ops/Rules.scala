package graft.ops

import graft.query.Filter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based inference — the Spark analog of the reference's
  * RuleBasedInferenceEngine (reference: src/linkml_store/inference/
  * implementations/rule_based_inference_engine.py: expression_matches
  * walks any_of/all_of/none_of/slot conditions, apply_rule sets
  * postcondition slots). Graft's [[graft.query.Filter]] AST already
  * expresses the precondition algebra ($and/$or/$not + comparisons),
  * so a rule is precondition Filter + postcondition column
  * assignments, and applying a rule set is ONE projection over the
  * corpus — no per-object python loop, no driver round-trip.
  *
  * Rules apply IN ORDER (later rules see earlier rules' assignments,
  * matching the reference's sequential mutate).
  */
object Rules {

  /** One rule: where `pre` matches, set each `post` column. Postcondition
    * values are arbitrary Columns, so `equals_expression`-style computed
    * assignments (e.g. `col("a") + col("b")`) come free.
    */
  final case class Rule(pre: Filter, post: Map[String, Column])

  /** Apply rules sequentially; non-matching rows keep their values.
    * New columns materialize as null where no rule fired. WITHIN one
    * rule all assignments apply SIMULTANEOUSLY from the pre-rule state
    * (so `Map("a" -> col("b"), "b" -> col("a"))` swaps) — chaining them
    * would make the result depend on Map iteration order.
    */
  def applyRules(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df) { (cur, rule) =>
      cur.withColumns(rule.post.map { case (field, value) =>
        field -> (
          if (cur.schema.fieldNames.contains(field))
            when(rule.pre.toColumn, value).otherwise(col(field))
          else when(rule.pre.toColumn, value))
      })
    }

  /** Prediction accuracy over rows with a non-null target (reference:
    * inference/evaluation.py evaluate_predictor / Outcome.accuracy):
    * exact match of predicted vs target, one aggregation.
    */
  def accuracy(df: DataFrame, targetCol: String, predCol: String): Double = {
    val row = df.filter(col(targetCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        count(when(col(predCol) === col(targetCol), 1)).as("hits"))
      .collect()(0)
    val n = row.getLong(0)
    if (n == 0) 0.0 else row.getLong(1).toDouble / n
  }
}
