package graft

import org.apache.spark.sql.SparkSession

/** Shared local-mode session builder for the driver-contract mains
  * (Bench / Verify / Profile / Cli / ScaleSmoke): one place for the
  * engine configuration, so every entry point runs the IDENTICAL
  * engine — a config added here (extension, codec, timezone) cannot
  * silently diverge between the benchmarked engine and the others.
  *
  * Thread count defaults to the machine (capped at the 32-thread
  * design point) — an unset env var must not quietly run local[4].
  */
object LocalSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)

  def build(): SparkSession = {
    val n = cpus
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      // pair of GenScale's 4 MB row groups: without this a 110 MB sf1
      // table is one 128 MB split = one task; 8 MB splits spread the
      // scan across the box. Driver-provided sf0.1 files are single
      // row groups (~11 MB) — they keep their one task either way.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
