package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("separable labels are separated: positives score above negatives") {
    // label = "long doc" is (noisily) encoded in feature x1 directly
    val scored = LogReg.classify(docs, "doc_id", "text",
      label = org.apache.spark.sql.functions.size(split(col("text"), " ")) > 40,
      iters = 20, lr = 2.0)
    val m = scored.groupBy("y").agg(avg("prob").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    m(1.0) should be > (m(0.0) + 0.2)
  }

  test("probabilities are valid and the output is one row per doc") {
    val scored = LogReg.classify(docs, "doc_id", "text",
      label = col("lang") === "en", iters = 3, lr = 1.0)
    scored.count() shouldBe docs.count()
    scored.filter(col("prob") < 0 || col("prob") > 1).count() shouldBe 0L
  }

  test("training is deterministic across runs") {
    def run() = LogReg.classify(docs, "doc_id", "text",
      label = col("lang") === "en", iters = 3, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    run() shouldBe run()
  }

  test("more iterations reduce the training log-loss") {
    def logLoss(iters: Int): Double = {
      val s = LogReg.classify(docs, "doc_id", "text",
        label = col("lang") === "en", iters = iters, lr = 1.0)
      // clamp away from 0/1 since probs are rounded to 4dp
      val p = greatest(least(col("prob"), lit(0.9999)), lit(0.0001))
      s.agg(avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))))
        .collect()(0).getDouble(0)
    }
    logLoss(10) should be <= logLoss(1)
  }
}
