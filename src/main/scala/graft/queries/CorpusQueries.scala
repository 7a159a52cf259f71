package graft.queries

import graft.Tables
import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Corpus-level text statistics over `documents` (SURVEY §2 rows
  * 47g-47i): frequent n-grams, per-doc tf-idf terms, and train/eval
  * n-gram decontamination. Each oracle recomputes the identical result
  * in DuckDB; tf-idf rounds scores to 4dp BEFORE ranking so both
  * engines rank the same values.
  */
object CorpusQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_top_ngrams",
      (s, d) => Corpus.topNgrams(Tables.df(s, d, "documents"), "text", w = 2, k = 25),
      Some(Corpus.topNgramsDuckSql("documents", "text", w = 2, k = 25))),

    Q("q_tfidf",
      (s, d) => Corpus.tfIdf(Tables.df(s, d, "documents"), "doc_id", "text", topK = 3),
      Some(Corpus.tfIdfDuckSql("documents", "doc_id", "text", topK = 3))),

    // eval set = source 'src0'; w=4 grams (the reference-style 8-13
    // gram windows need longer docs than the synthetic corpus carries)
    Q("q_decontaminate",
      (s, d) => Corpus.decontaminate(
        Tables.df(s, d, "documents"), "doc_id", "text",
        evalPred = col("source") === "src0", w = 4),
      Some(Corpus.decontaminateDuckSql(
        "documents", "doc_id", "text", "source = 'src0'", w = 4))),

    // corpus health dashboard: per-language token/vocab/hapax/top-share
    Q("q_vocab_stats",
      (s, d) => Corpus.vocabStats(Tables.df(s, d, "documents"), "lang", "text"),
      Some(Corpus.vocabStatsDuckSql("documents", "lang", "text"))),

    // distribution drift between language corpora: add-one-smoothed KL
    // over the global vocabulary, absent-absent mass in closed form
    Q("q_corpus_kl",
      (s, d) => Corpus.klDivergence(Tables.df(s, d, "documents"), "lang", "text"),
      Some(Corpus.klDivergenceDuckSql("documents", "lang", "text")))
  )
}
