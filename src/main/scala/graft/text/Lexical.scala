package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.PortableRound

/** Corpus-level lexical signals beyond per-doc quality stats:
  * diversity, burstiness, and source concentration. All counts and
  * ratios are integer-exact ([[graft.ops.PortableRound]]).
  */
object Lexical {

  /** Per-doc lexical diversity: type-token ratio (penalizes small
    * vocabularies) + Simpson repeat probability Σc(c−1)/(n(n−1))
    * (penalizes skew toward a few tokens) — the "stuck-in-a-loop"
    * generation signal next to the n-gram repetition kernels. One
    * explode + two-level aggregation; token-linear.
    */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
    tf.groupBy(idCol)
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c") * (col("c") - 1)).as("rep"))
      .filter(col("n_tokens") >= 2)
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        PortableRound.intRound4(col("n_distinct"), col("n_tokens")).as("ttr"),
        PortableRound.intRound4(col("rep"),
          col("n_tokens") * (col("n_tokens") - 1)).as("simpson"))
      .orderBy(idCol)
  }

  /** Token burstiness (Church & Gale): mean occurrences per
    * CONTAINING document, c/df. Separates "common because
    * ubiquitous" from "common because a few docs repeat it". Two-level
    * keyed agg — df needs no count-distinct pass — and a deterministic
    * top-k TakeOrdered ((c, tok) is unique per row).
    */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5, topK: Int = 50): DataFrame = {
    val dt = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
    dt.groupBy("tok")
      .agg(sum("c").as("c"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("tok"), col("c"), col("df"),
        PortableRound.intRound4(col("c"), col("df")).as("burstiness"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(topK)
  }

  /** Source-concentration Gini over per-group token mass (0 = groups
    * contribute equally, →1 = one group owns the token budget) — the
    * one-number mixing-health check. Per-group totals collapse to ONE
    * collected row (the group domain is a bounded enum by contract);
    * ranks come from sort_array + sequence inside Catalyst — no
    * partition-less window, no self-join. Gini = Σ(2i−n−1)·Tᵢ/(n·ΣT)
    * on longs.
    */
  def sourceGini(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val st = df.groupBy(groupCol)
      .agg(sum(size(TextFunctions.tokens(col(textCol)))).cast("long").as("t"))
    st.agg(collect_list(struct(col("t"), col(groupCol))).as("arr"))
      .select(
        expr("size(arr)").cast("long").as("n_sources"),
        expr("aggregate(sort_array(arr), 0L, (a, x) -> a + x.t)")
          .as("total_tokens"),
        expr("""aggregate(
                  zip_with(sort_array(arr), sequence(1, size(arr)),
                    (x, i) -> (CAST(2 * i AS BIGINT) - size(arr) - 1) * x.t),
                  0L, (a, y) -> a + y)""").as("num"))
      .select(col("n_sources"), col("total_tokens"),
        PortableRound.intRound4(col("num"),
          col("n_sources") * col("total_tokens")).as("gini"))
  }
}
