package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide exact LINE deduplication (the RefinedWeb/FineWeb "exact
  * line dedup" pass): every distinct line keeps ONLY its globally first
  * occurrence — lowest (document id, line position) — and every later
  * repeat is removed, across documents and within them. This is the
  * third granularity in the dedup ladder: document-level
  * ([[graft.dedup.MinHash]]/exact), span-level
  * ([[graft.dedup.SpanDedup]] — fixed-width token grams), and line-level
  * (this op — natural text units, the granularity web-corpus pipelines
  * dedup at before document-level passes). It differs from
  * [[graft.text.Clean.dropBoilerplate]] in both rule and state:
  * boilerplate drops EVERY copy of lines above a document-frequency
  * threshold via a bounded broadcast set; line dedup KEEPS one canonical
  * copy of every line with no threshold, so its state is the full
  * distinct-line table and must stay distributed.
  *
  * Scale shape (100 TB): one shuffle keyed on the 60-bit line hash for
  * the first-occurrence table — `min(struct(doc, pos))` is a partial
  * aggregate, so a hot line (an empty line, a shared footer) combines
  * map-side instead of piling its copies into one task the way a
  * per-hash window would. The join back is keyed on the same hash; a
  * hot line's probe rows all match one 1-row group (AQE skew split
  * applies). Re-assembly is a per-document aggregate. Nothing is
  * collected to the driver and no bound is assumed on the number of
  * distinct lines — contrast dropBoilerplate's deliberate maxBoilerplate
  * cap on its broadcast set.
  *
  * Reference anchor: linkml-store has no line-level operator (its dedup
  * surface is collection-level); this is an engine extension for the
  * LLM-pipeline family (SURVEY §2 dedup rows).
  */
object LineDedup {

  /** Per-document result: (idCol, n_lines, n_kept, clean_text) where
    * clean_text re-joins the surviving lines in original order. A
    * document whose every line is a repeat survives with n_kept = 0 and
    * clean_text = '' (same contract as dropBoilerplate).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    // null text coalesces to '' (one empty line) so n_lines matches the
    // Duck twin instead of size(split(null)) = -1 vs len(NULL) = NULL
    val txt = coalesce(col(textCol), lit(""))
    val lined = df.select(col(idCol).as("__id"),
      posexplode(split(txt, sepRe)).as(Seq("__pos", "__line")))
      .withColumn("__h", TextFunctions.portableHash60(col("__line")))
    // global first occurrence per line hash — struct ordering compares
    // __id then __pos, so the min IS "earliest document, then earliest
    // position", deterministically
    val firsts = lined.groupBy("__h")
      .agg(min(struct(col("__id"), col("__pos"))).as("__f"))
    val kept = lined.join(firsts, "__h")
      .filter(col("__id") === col("__f.__id") && col("__pos") === col("__f.__pos"))
    val re = kept.groupBy("__id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), sep).as("clean_text"))
    df.select(col(idCol), size(split(txt, sepRe)).as("n_lines"))
      .join(re, col(idCol) === re("__id"), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** DuckDB twin of [[dedupLines]]: same 60-bit md5 line hash (both
    * engines group on the hash, so even collisions agree), first
    * occurrence via row_number ordered by (id, position) — the same
    * total order the Spark side minimizes — and the same positional
    * string_agg re-assembly as the dropBoilerplate twin.
    */
  def dedupLinesDuckSql(table: String, idCol: String, textCol: String,
      sep: String = "\n"): String = {
    def esc(s: String) = s.replace("'", "''")
    val s0 = esc(sep)
    val h = "CAST(concat('0x', substr(md5(line), 1, 15)) AS UBIGINT)"
    s"""WITH lined AS (
       |  SELECT $idCol, string_split(coalesce($textCol, ''), '$s0') AS lines FROM $table),
       |pos AS (
       |  SELECT $idCol, lines[i] AS line, i FROM lined,
       |       unnest(range(1, len(lines) + 1)) AS u(i)),
       |ranked AS (
       |  SELECT $idCol, line, i,
       |         row_number() OVER (PARTITION BY $h ORDER BY $idCol, i) AS rn
       |  FROM pos),
       |kept AS (SELECT $idCol, line, i FROM ranked WHERE rn = 1)
       |SELECT l.$idCol,
       |  CAST(len(l.lines) AS INT) AS n_lines,
       |  CAST(coalesce(k.nk, 0) AS BIGINT) AS n_kept,
       |  coalesce(k.txt, '') AS clean_text
       |FROM lined l LEFT JOIN (
       |  SELECT $idCol, count(*) AS nk,
       |         string_agg(line, '$s0' ORDER BY i) AS txt
       |  FROM kept GROUP BY $idCol) k USING ($idCol)""".stripMargin
  }
}
