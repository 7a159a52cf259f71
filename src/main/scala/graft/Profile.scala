package graft


/** Dev profiling main: run named queries (or all) against a sf dir,
  * print per-query wall time and optionally the formatted plan.
  *
  *   sbt "runMain graft.Profile <sfDir> [explain] q_name [q_name ...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val explain = rest.contains("explain")
    val names = rest.filterNot(_ == "explain")
    val spark = LocalSession.build()
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.df(spark, sfDir, "lineitem").select("l_orderkey").limit(1000)
      .queryExecution.toRdd.foreach(_ => ())
    val qs = SparkEntry.queries
    val sel = if (names.isEmpty) qs.keys.toSeq.sorted else names.toSeq
    sel.foreach { name =>
      // Time CONSTRUCTION + execution: eager builders (cluster/describe/
      // MMR) do their work while the DataFrame is being built, so timing
      // only the final toRdd pass would hide them entirely.
      val t0 = System.nanoTime()
      val df = qs(name)(spark, sfDir)
      val tBuilt = System.nanoTime()
      if (explain) {
        println(s"===== $name plan =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val sec = (System.nanoTime() - t1 + (tBuilt - t0)) / 1e9
      val buildSec = (tBuilt - t0) / 1e9
      graft.api.CacheScope.global.release()
      println(f"[profile] $name%-22s $sec%8.3f s (build $buildSec%.3f s)")
    }
    spark.stop()
  }
}
