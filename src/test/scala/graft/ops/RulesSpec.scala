package graft.ops

import graft.SparkSpec
import graft.query.Filter
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1, "alice", 30, "no"),
    (2, "bob", 16, "no"),
    (3, "carol", 70, "no")).toDF("id", "name", "age", "senior")

  test("rules set postcondition slots where preconditions match") {
    val rules = Seq(
      Rules.Rule(Filter.gte("age", 65), Map("senior" -> lit("yes"))),
      Rules.Rule(Filter.lt("age", 18), Map("category" -> lit("minor"))))
    val out = Rules.applyRules(people, rules)
      .orderBy("id").select("senior", "category")
      .as[(String, Option[String])].collect()
    out shouldBe Array(("no", None), ("no", Some("minor")), ("yes", None))
  }

  test("rules apply in order: later rules see earlier assignments") {
    val rules = Seq(
      Rules.Rule(Filter.eq("name", "bob"), Map("age" -> lit(99))),
      Rules.Rule(Filter.gte("age", 65), Map("senior" -> lit("yes"))))
    val out = Rules.applyRules(people, rules)
      .filter($"name" === "bob").select("senior").as[String].collect()
    out shouldBe Array("yes") // bob's rewritten age fires the senior rule
  }

  test("computed assignments and compound preconditions") {
    val pre = Filter.And(Seq(Filter.gt("age", 18),
      Filter.Not(Filter.eq("name", "carol"))))
    val out = Rules.applyRules(people,
      Seq(Rules.Rule(pre, Map("age2" -> (col("age") * 2)))))
      .orderBy("id").select("age2").as[Option[Int]].collect()
    out shouldBe Array(Some(60), None, None)
  }

  test("one rule's assignments apply simultaneously from pre-rule state") {
    val df = Seq((1, 10, 20)).toDF("id", "a", "b")
    val out = Rules.applyRules(df,
      Seq(Rules.Rule(Filter.True, Map("a" -> col("b"), "b" -> col("a")))))
      .select("a", "b").as[(Int, Int)].collect().head
    out shouldBe ((20, 10)) // a swap, not a chain
  }

  test("accuracy compares prediction to target, ignoring null targets") {
    val df = Seq(
      ("a", "a"), ("a", "b"), ("c", "c"), (null, "x")
    ).toDF("target", "pred")
    Rules.accuracy(df, "target", "pred") shouldBe (2.0 / 3.0) +- 1e-12
  }
}
