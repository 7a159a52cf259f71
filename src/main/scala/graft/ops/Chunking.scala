package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking — the standard LLM training / RAG
  * preprocessing step the reference leaves to callers: split each
  * document into overlapping windows of `win` whitespace tokens,
  * advancing by `stride` (stride < win ⇒ overlap; the trailing window
  * is truncated, never dropped).
  *
  * Spark-first shape: tokenize once per row, generate the start
  * offsets with `sequence`, and `posexplode` them — the token array is
  * carried through the generate (required child output), never
  * recomputed per chunk. One scan, zero shuffles, codegen throughout;
  * chunk rows flow straight into downstream partial aggregations, so
  * the operator composes at 100 TB without materializing the chunked
  * corpus.
  */
object Chunking {

  /** (idCol, chunk_idx, start_tok, n_chunk_toks, chunk) — one row per
    * window. NULL text yields no rows (sequence of NULL explodes to
    * nothing), mirroring the DuckDB twin.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      win: Int = 16, stride: Int = 8): DataFrame = {
    require(win >= 1 && stride >= 1, s"win/stride must be >= 1 (got $win/$stride)")
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        least(lit(win), size(col("__toks")) - col("start_tok")).as("n_chunk_toks"),
        concat_ws(" ", slice(col("__toks"), col("start_tok") + 1, lit(win))).as("chunk"))
  }

  /** DuckDB twin: range() is end-exclusive and list slicing is 1-based
    * inclusive, so starts = range(0, len, stride) and the window is
    * toks[s+1 : s+win].
    */
  def chunkDuckSql(table: String, idCol: String, textCol: String,
      win: Int = 16, stride: Int = 8): String =
    s"""SELECT $idCol,
       |  CAST(start_tok // $stride AS INT) AS chunk_idx,
       |  CAST(start_tok AS INT) AS start_tok,
       |  CAST(least($win, len(toks) - start_tok) AS INT) AS n_chunk_toks,
       |  array_to_string(toks[start_tok + 1 : start_tok + $win], ' ') AS chunk
       |FROM (
       |  SELECT $idCol, toks, unnest(range(0, len(toks), $stride)) AS start_tok
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS toks FROM $table) t1) t2""".stripMargin
}
