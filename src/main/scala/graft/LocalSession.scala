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
      // prefer shuffled-hash over sort-merge when the per-partition
      // build side fits (guide §3.1/§9): skips both sort passes on
      // every equi-join; scale-independent planner policy (SHJ spills
      // per-partition at cluster scale), overridable via env
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      // let AQE rewrite planned SMJ to SHJ when every post-shuffle
      // partition's map output is under this bound (default 0 = off)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCAL_MAP", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
