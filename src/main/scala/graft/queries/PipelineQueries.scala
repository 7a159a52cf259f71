package graft.queries

import graft.Tables
import graft.ops.{Chunking, TrainStream}
import graft.text.QualityFilter
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface
  * (SURVEY §2 LLM-pipeline rows): token-window chunking, composite
  * quality gating, deterministic source interleaving, and fixed-budget
  * sequence packing — the post-dedup "last mile" of a pretraining
  * corpus build, each a one-scan distributed plan.
  */
object PipelineQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_chunk",
      (s, d) => Chunking.chunk(Tables.df(s, d, "documents"), "doc_id", "text",
        win = 16, stride = 8)
        .orderBy("doc_id", "chunk_idx"),
      Some(Chunking.chunkDuckSql("documents", "doc_id", "text", win = 16, stride = 8)
        + "\nORDER BY doc_id, chunk_idx")),

    Q("q_quality_filter",
      (s, d) => QualityFilter.flags(Tables.df(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(QualityFilter.flagsDuckSql("documents", "doc_id", "text")
        + "\nORDER BY doc_id")),

    Q("q_interleave",
      (s, d) => TrainStream.interleave(Tables.df(s, d, "documents"),
        "doc_id", "source", salt = "r4")
        .orderBy("round", "mix_key"),
      Some(TrainStream.interleaveDuckSql("documents", "doc_id", "source", salt = "r4")
        + "\nORDER BY round, mix_key")),

    Q("q_pack_sequences",
      (s, d) => TrainStream.packSequences(Tables.df(s, d, "documents"),
        "doc_id", "text", seqLen = 256, salt = "r4")
        .orderBy("start_off"),
      Some(TrainStream.packSequencesDuckSql("documents", "doc_id", "text",
        seqLen = 256, salt = "r4") + "\nORDER BY start_off"))
  )
}
