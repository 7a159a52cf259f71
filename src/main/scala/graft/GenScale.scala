package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the driver's test parquet — turns the
  * sf0.1 tables into an sf1-equivalent set so the full query registry
  * can be BENCHED AND ORACLE-CHECKED at another order of magnitude
  * (the scale claims otherwise rest on sf0.1 plus ScaleSmoke's
  * in-memory synthetics).
  *
  * Shape rules, per table:
  *  - fixed dimensions (region, nation) copy through — TPC-H keeps
  *    them constant across scale factors;
  *  - keyed tables get k id-shifted copies with every PRIMARY AND
  *    FOREIGN key shifted by the same per-copy offset, so each copy is
  *    referentially self-contained and joins scale like real data;
  *  - documents get a STOPWORD-PRESERVING per-copy token salt (the
  *    ScaleSmoke corpus_build rule): copies stay near-dup-distinct (no
  *    artificial 10-way duplicate clusters), the vocabulary grows with
  *    the corpus, and stopword-derived signals (quality gates, lang-id)
  *    keep their pass rates; n_chars is recomputed to keep its
  *    invariant;
  *  - embeddings get a per-row deterministic phase jitter (the
  *    ScaleSmoke rule: a constant per-copy offset would collapse whole
  *    copies into a handful of LSH buckets) — labels pass through;
  *  - values/timestamps pass through unchanged: the oracle computes on
  *    the same rows, and parquet NTZ timestamps round-trip byte-equal
  *    because the session reads them as TIMESTAMP_NTZ.
  *
  * Each table lands as ONE file `<dst>/<name>.parquet` (the driver
  * layout both Tables.df and tools/check_oracle.py expect).
  *
  * Run: sbt "runMain graft.GenScale [src] [dst] [copies]"
  *   defaults: /root/testdata/sf0.1 /root/repo/testdata/sf1 10
  */
object GenScale {

  private val Off = 100000000L // per-copy id offset, clear of all key ranges

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = LocalSession.build()
    // NTZ timestamps must survive as NTZ (isAdjustedToUTC=false micros,
    // the source layout) — read-as-local would re-write them adjusted
    // and DuckDB would see TIMESTAMPTZ at sf1 but TIMESTAMP at sf0.1
    spark.conf.set("spark.sql.parquet.inferTimestampNTZType", "true")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def shiftKeys(df: DataFrame, i: Int, keys: Seq[String]): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))

    def xCopies(name: String, keys: Seq[String],
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = read(name)
      (0 until copies).map { i =>
        if (i == 0) base else perCopy(shiftKeys(base, i, keys), i)
      }.reduce(_ unionByName _)
    }

    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      // ONE file (the driver layout) but MANY row groups: a 110 MB
      // single-row-group parquet is unsplittable — every sf1 scan ran
      // as ONE task regardless of maxPartitionBytes (measured: 14 s
      // for scan+hash of lineitem on a 32-core box). 4 MB groups give
      // byte-range splits real row-group boundaries to bind to;
      // LocalSession pairs this with files.maxPartitionBytes=8m.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dst/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally w.close()
      println(s"[genscale] $name -> $dst/$name.parquet")
    }

    // fixed dimensions
    writeOne(read("region"), "region")
    writeOne(read("nation"), "nation")

    // TPC-H-ish keyed tables: shift pk + every fk per copy
    writeOne(xCopies("customer", Seq("c_custkey")), "customer")
    writeOne(xCopies("supplier", Seq("s_suppkey")), "supplier")
    writeOne(xCopies("part", Seq("p_partkey")), "part")
    writeOne(xCopies("orders", Seq("o_orderkey", "o_custkey")), "orders")
    writeOne(xCopies("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    writeOne(xCopies("events", Seq("event_id", "user_id")), "events")

    // documents: stopword-preserving letters-only token salt per copy
    val docs = xCopies("documents", Seq("doc_id"), (d, i) => {
      val salted = concat_ws(" ", transform(split(col("text"), " "),
        t => when(t.isin(graft.text.TextFunctions.stopwords: _*), t)
          .otherwise(concat(t, lit("q" * i)))))
      d.withColumn("text", salted)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    writeOne(docs, "documents")

    // embeddings: per-row phase jitter keeps copies bucket-distinct
    val embs = xCopies("embeddings", Seq("vec_id"), (d, i) =>
      d.withColumn("embedding", transform(col("embedding"),
        (x, j) => x + (cos(j.cast("double") * lit(i.toDouble) +
          col("vec_id").cast("double")) * lit(0.05)).cast("float"))))
    writeOne(embs, "embeddings")

    spark.stop()
  }
}
