package graft

import org.apache.spark.sql.functions._

/** CRUD-at-scale bench: measures the bucketed collection's core
  * contract — "an upsert of k keys rewrites ≤ k buckets, not the
  * table" — as WALL TIME, not just the spec-pinned bucket count
  * (BucketedParquetCollectionSpec). Loads the sf1 orders table
  * (~1.5M rows) into both collection layouts, upserts the same 10
  * modified rows into each, and reports the two times plus the
  * speedup. At 100 TB the ratio is the point: the versioned
  * ParquetCollection rewrites the full snapshot per mutation (the
  * reference semantics, fine for small curated collections), while
  * the bucketed layout rewrites touched buckets only — a handful of
  * keys touch ≤ 10/64 of the data here and ~0.001% at 1000 buckets.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 sbt "runMain graft.BenchCrud"
  * Prints ONE JSON line (BENCH_CRUD.json evidence).
  */
object BenchCrud {
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
    val tBucketed = time(bucketed.upsert(deltaDf))
    val tFull = time(full.upsert(deltaDf, Seq("o_orderkey")))

    // sanity: same logical content after both mutation chains
    val nB = bucketed.count()
    val nF = full.count()
    require(nB == nRows && nF == nRows,
      s"row drift after upserts: bucketed=$nB full=$nF expected=$nRows")

    val speedup = tFull / math.max(tBucketed, 1e-9)
    System.err.println(
      f"[crud] bucketed 10-key upsert $tBucketed%.2f s vs full rewrite $tFull%.2f s (${speedup}%.1fx)")
    val line =
      s"""{"metric":"crud_bucketed_upsert","unit":"sec","n_rows":$nRows,""" +
      s""""n_buckets":$nBuckets,"bucketed_upsert_s":$tBucketed,""" +
      s""""full_rewrite_upsert_s":$tFull,"speedup":$speedup,"sf":"$sfDir"}"""
    // committed-evidence file, same convention as Bench -> BENCH_FULL.json
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_CRUD.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[crud] BENCH_CRUD.json write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
