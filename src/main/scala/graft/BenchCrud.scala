package graft

import org.apache.spark.sql.functions._

/** CRUD-at-scale bench: measures the bucketed collection's core
  * contract — "an upsert of k keys rewrites ≤ k buckets, not the
  * table" — as BYTES REWRITTEN and wall time. Loads the sf1 orders
  * table (~1.5M rows) into both collection layouts, upserts the same
  * 10 modified rows into each, and reports what each layout wrote.
  *
  * Bytes are the 100 TB metric: the versioned ParquetCollection
  * rewrites the full snapshot per mutation (the reference semantics,
  * fine for small curated collections) while the bucketed layout
  * rewrites touched buckets only — ≤ 10/64 of the data here, ~0.001%
  * at 1000 buckets. Wall time at THIS scale (a ~20 MB table) is
  * dominated by fixed per-job cost, not I/O, so the bytes ratio — not
  * the seconds ratio — is what extrapolates: the full rewrite's cost
  * grows with the table, the bucketed upsert's with k buckets.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 sbt "runMain graft.BenchCrud"
  * Prints ONE JSON line and writes it to BENCH_CRUD.json.
  */
object BenchCrud {

  private def filesUnder(p: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) return Map.empty
    val w = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f))
        .map(f => f.toString -> java.nio.file.Files.size(f)).toMap
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_CRUD_BUCKETS", "64").toInt
    val spark = LocalSession.build()
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup

    val src = Tables.df(spark, sfDir, "orders")
    val nRows = src.count()
    val work = java.nio.file.Files.createTempDirectory("graft_crud_bench").toString

    val bucketed = new api.BucketedParquetCollection(
      spark, s"$work/bucketed", "orders", pk = "o_orderkey", nBuckets = nBuckets)
    bucketed.replace(src)
    val full = new api.ParquetCollection(spark, s"$work/full", "orders")
    full.replace(src)
    val tableBytes = filesUnder(s"$work/full").values.sum

    // 10 existing keys, one column modified — the "fix a handful of
    // rows" mutation a curation workflow issues constantly
    val delta = src.orderBy("o_orderkey").limit(10)
      .withColumn("o_comment", lit("corrected by curation pass"))
      .collect()
    val deltaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(delta.toIndexedSeq, 1), src.schema)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (JIT + committed v1), then measure v2
    bucketed.upsert(deltaDf)
    full.upsert(deltaDf, Seq("o_orderkey"))
    val bBefore = filesUnder(s"$work/bucketed")
    val tBucketed = time(bucketed.upsert(deltaDf))
    val bucketedBytes = (filesUnder(s"$work/bucketed") -- bBefore.keySet).values.sum
    val fBefore = filesUnder(s"$work/full")
    val tFull = time(full.upsert(deltaDf, Seq("o_orderkey")))
    val fullBytes = (filesUnder(s"$work/full") -- fBefore.keySet).values.sum

    // sanity: same logical content after both mutation chains
    val nB = bucketed.count()
    val nF = full.count()
    require(nB == nRows && nF == nRows,
      s"row drift after upserts: bucketed=$nB full=$nF expected=$nRows")

    val bytesRatio = fullBytes.toDouble / math.max(bucketedBytes, 1L)
    System.err.println(
      f"[crud] 10-key upsert: bucketed wrote $bucketedBytes%,d B in $tBucketed%.2f s, " +
      f"full rewrite wrote $fullBytes%,d B in $tFull%.2f s (bytes ratio $bytesRatio%.1fx)")
    val line =
      s"""{"metric":"crud_bucketed_upsert","unit":"bytes","n_rows":$nRows,""" +
      s""""n_buckets":$nBuckets,"table_bytes":$tableBytes,""" +
      s""""bucketed_upsert_bytes":$bucketedBytes,"full_rewrite_bytes":$fullBytes,""" +
      s""""bytes_ratio":$bytesRatio,"bucketed_upsert_s":$tBucketed,""" +
      s""""full_rewrite_upsert_s":$tFull,"sf":"$sfDir"}"""
    // committed-evidence file, same convention as Bench -> BENCH_FULL.json
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_CRUD.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[crud] BENCH_CRUD.json write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
