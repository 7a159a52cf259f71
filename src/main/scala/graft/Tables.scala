package graft

import graft.api.Collection
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Tables whose queries are map-compute-heavy (explodes, per-token
    * hashing, vector math): spread these when the source files
    * under-partition. lineitem/orders are NOT here: their queries are
    * scan->partial-agg shapes where an up-front row shuffle costs more
    * than the map parallelism buys (measured q1_agg 1.9->2.4 s,
    * describe 3->5 s with them spread).
    */
  private val factTables = Set("events", "documents", "embeddings")

  /** Spread a small-file scan across the cluster. The local test parquet
    * is one row-group per table — ONE input partition — which serializes
    * every map-side operator (explode/md5/vector ops) on a single core
    * while 31 idle. Repartition ONLY when the source parallelism is well
    * below the cluster's: at real scale (100 TB = thousands of splits)
    * this is a no-op, so no gratuitous full-corpus shuffle is added.
    * Explicit numPartitions keeps AQE from coalescing it back.
    */
  private def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = rawDf(spark, dir, name)
    if (factTables(name)) spread(raw) else raw
  }

  private def rawDf(spark: SparkSession, dir: String, name: String): DataFrame = {
    // idempotent: native graft functions (graft_dot) for any session
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      // events.ts has shipped as either parquet TIMESTAMP(NANOS) or
      // timestamp[us] across testdata generations — branch on the type
      // Spark actually read, not on an assumed generation.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // TIMESTAMP(NANOS) read as long ns (nanosAsLong): floor-divide
          // to us via pmod (not `div`, which truncates toward zero) —
          // DuckDB's ns->us cast floors, so pre-epoch timestamps would
          // otherwise diverge by 1us.
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        case _ =>
          // timestamp[us] with isAdjustedToUTC=false arrives as
          // TIMESTAMP_NTZ; the session TZ is pinned UTC, so the cast to
          // TIMESTAMP is instant-preserving and keeps every downstream
          // unix_micros/date_trunc/oracle comparison unchanged.
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  def coll(spark: SparkSession, dir: String, name: String): Collection =
    new Collection(name, df(spark, dir, name))
}
