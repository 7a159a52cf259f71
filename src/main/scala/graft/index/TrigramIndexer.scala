package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed character-trigram indexer — the engine analog of the
  * reference's SimpleIndexer (reference: src/linkml_store/index/
  * implementations/simple_indexer.py:11-43: lowercase, char 3-grams,
  * hash each to a bucket modulo the vector length, count).
  *
  * Spark-first divergence: instead of materializing a dense
  * `dim`-length vector per document (reference does numpy zeros + adds),
  * the index is SPARSE rows (id, bucket, cnt) — explode + one shuffle.
  * Cosine search joins the (small, broadcast) query vector on `bucket`,
  * so search cost is proportional to matching postings, not corpus ×
  * dim. All counts are integers: scores are exact up to the final
  * division. Hash is md5-derived (not sha1 as the reference) so the
  * identical computation runs in DuckDB for the oracle.
  */
object TrigramIndexer {
  val DefaultDim = 512

  /** Char-trigram array of lower(text); empty when len < 3. */
  def trigrams(text: Column): Column = {
    val t = lower(text)
    when(length(t) < 3, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(t) - 2),
        i => substr(t, i, lit(3))))
  }

  /** 60-bit md5 hash of a trigram, modulo dim (non-negative). */
  def bucketOf(tri: Column, dim: Int = DefaultDim): Column =
    pmod(conv(substring(md5(tri), 1, 15), 16, 10).cast("long"), lit(dim.toLong))

  /** Sparse index: (idCol, bucket, cnt) rows. One scan + one shuffle.
    * The per-row intermediate is an array of bucket LONGS (primitive),
    * not trigram strings — materializing a 400-element UTF8String array
    * per document before the explode measured 6 s alone at sf0.1.
    */
  def index(df: DataFrame, idCol: String, textCol: String, dim: Int = DefaultDim): DataFrame = {
    // One native row-level call ([[graft.functions.TrigramBuckets]])
    // computes every occurrence's bucket as a primitive long array —
    // replacing the explode(positions) -> substr -> md5 -> conv chain
    // (measured alternatives at sf0.1, 32-way input: dictionary
    // broadcast join 1.05 s, two-level agg 1.0 s, position-explode
    // 0.7 s, this ~0.45 s). The explode emits (id, bucket) pairs
    // straight into the partial aggregation; only (id, bucket, cnt)
    // reaches the shuffle. Bit-identical to the SQL chain
    // (spec-asserted), so the DuckDB oracle is unchanged.
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        explode(call_function("graft_trigram_buckets", col(textCol), lit(dim))).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side trigram vector of a query string (same hash pipeline).
    * Bounded by |query| — this is plain Scala, not a Spark job.
    */
  def queryVector(query: String, dim: Int = DefaultDim): Map[Long, Long] = {
    val t = query.toLowerCase
    val tris = (0 to t.length - 3).map(i => t.substring(i, i + 3))
    tris.groupBy(tri => math.floorMod(hash60(tri), dim.toLong))
      .map { case (b, g) => b -> g.size.toLong }
  }

  private val digestLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Scala twin of [[graft.text.TextFunctions.portableHash60]]
    * (thread-cached digest, no per-call hex-string build: the first 15
    * hex chars are the top 60 bits of the first 8 digest bytes).
    */
  def hash60(s: String): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // 15 hex chars = 60 bits = first 7.5 bytes, big-endian
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  // --- DuckDB oracle fragments -------------------------------------

  /** Duck SQL for the sparse index rows over `table`. */
  def indexDuckSql(table: String, idCol: String, textCol: String, dim: Int = DefaultDim): String =
    s"""SELECT $idCol, bucket, count(*) AS cnt FROM (
       |  SELECT $idCol,
       |    CAST(CAST(concat('0x', substr(md5(tri), 1, 15)) AS UBIGINT) % $dim AS BIGINT) AS bucket
       |  FROM (
       |    SELECT $idCol,
       |      unnest(list_transform(range(1, greatest(length(lower($textCol)) - 1, 1)),
       |        i -> substr(lower($textCol), i, 3))) AS tri
       |    FROM $table) t1) t2
       |GROUP BY $idCol, bucket""".stripMargin

  /** Duck SQL computing the query vector from a string literal. */
  def queryVectorDuckSql(query: String, dim: Int = DefaultDim): String = {
    val q = query.replace("'", "''")
    s"""SELECT bucket, count(*) AS qcnt FROM (
       |  SELECT CAST(CAST(concat('0x', substr(md5(tri), 1, 15)) AS UBIGINT) % $dim AS BIGINT) AS bucket
       |  FROM (
       |    SELECT unnest(list_transform(range(1, greatest(length(lower('$q')) - 1, 1)),
       |      i -> substr(lower('$q'), i, 3))) AS tri) t1) t2
       |GROUP BY bucket""".stripMargin
  }
}
