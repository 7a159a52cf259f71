package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the simplified
  * KenLM/CCNet quality signal: per-document cross-entropy
  * `-mean(ln p(tok))` under the corpus's own unigram distribution.
  * Low-entropy documents are repetitive boilerplate, high-entropy ones
  * are rare-token noise; both tails get filtered in a real pretraining
  * pipeline.
  *
  * Two distributed aggregations over ONE tokenized pass (cached): the
  * vocabulary (token -> count) and the per-document ln-probability sum.
  * The token table joins the vocabulary on the token key — a plain
  * keyed join that scales with corpus size; no driver-side model.
  * ln/± arithmetic is evaluated in the same order in DuckDB, matching
  * to libm ulps (well inside the 4dp oracle rounding).
  */
object UnigramLm {

  /** (idCol, n_toks, xent) per document; xent rounded to `roundTo`. */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String, roundTo: Int = 4,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    // one tokenize pass, cached: referenced by the vocab aggregate and
    // the per-doc score join
    val toks = scope.persist(df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok")))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        round(-sum(log(col("cnt").cast("double") / col("total"))) / count(lit(1)), roundTo)
          .as("xent"))
  }

  /** DuckDB twin of [[crossEntropy]]. */
  def crossEntropyDuckSql(table: String, idCol: String, textCol: String,
      roundTo: Int = 4): String =
    s"""SELECT $idCol, count(*) AS n_toks,
       |  round(-sum(ln(CAST(cnt AS DOUBLE) / total)) / count(*), $roundTo) AS xent
       |FROM (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok FROM $table) t
       |JOIN (SELECT tok, count(*) AS cnt
       |      FROM (SELECT unnest(string_split($textCol, ' ')) AS tok FROM $table) v
       |      GROUP BY tok) vocab USING (tok),
       |     (SELECT count(*) AS total
       |      FROM (SELECT unnest(string_split($textCol, ' ')) AS tok FROM $table) w) tot
       |GROUP BY $idCol""".stripMargin
}
