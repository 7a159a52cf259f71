package graft

import graft.api.Collection
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    // idempotent: native graft functions (graft_dot) for any session
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
      // type for: read it as a long (ns) and convert to a microsecond
      // timestamp, matching DuckDB's timestamp_ns -> timestamp cast.
      // The session conf is also set at session build in Verify/Bench;
      // setting it here too keeps ad-hoc sessions working.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // Floor division via pmod (not `div`, which truncates toward zero):
      // DuckDB's ns->us cast floors, so pre-epoch timestamps would
      // otherwise diverge by 1us.
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  def coll(spark: SparkSession, dir: String, name: String): Collection =
    new Collection(name, df(spark, dir, name))
}
