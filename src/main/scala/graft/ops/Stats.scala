package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-association statistics — the engine analog of the reference's
  * stats_utils predictive-power analysis (reference:
  * src/linkml_store/utils/stats_utils.py, which fits sklearn decision
  * trees per column pair on the driver). Re-expressed Spark-first as
  * pairwise MUTUAL INFORMATION over categorical columns: the same
  * "how much does x tell me about y" question, computed exactly from
  * one joint-count aggregation per pair (no ML library, no driver-side
  * training, identical arithmetic in the DuckDB oracle).
  *
  * MI(x, y) = sum over cells  p(x,y) * ln( p(x,y) / (p(x) p(y)) ),
  * in nats. Joint counts are one groupBy per pair; margins re-aggregate
  * the (tiny) joint table, so the corpus is scanned once per pair and
  * everything after the first aggregation is bounded by the category
  * cardinalities.
  */
object Stats {

  /** (x, y, n, mi) for every ordered pair of `cols` (x < y in `cols`
    * order). Null category values are excluded (both engines drop them
    * from the joint counts via the inner margin joins).
    *
    * ONE corpus scan for ALL pairs: each row melts into its (pair, xv,
    * yv) cells, one aggregation produces every pair's joint table, and
    * margins/totals re-aggregate that (tiny, persisted) table — N*(N-1)/2
    * pairs never means N*(N-1)/2 scans.
    */
  def mutualInfoPairs(df: DataFrame, cols: Seq[String], roundTo: Int = 4,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(cols.size >= 2, "mutualInfoPairs needs at least two columns")
    val pairCells = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield struct(
      lit(cols(i)).as("x"), lit(cols(j)).as("y"),
      col(cols(i)).cast("string").as("xv"), col(cols(j)).cast("string").as("yv"))
    // persisted: margins, totals, and the term join all re-aggregate it
    val joint = scope.persist(
      df.select(explode(array(pairCells: _*)).as("e"))
        .select(col("e.x").as("x"), col("e.y").as("y"),
          col("e.xv").as("xv"), col("e.yv").as("yv"))
        .filter(col("xv").isNotNull && col("yv").isNotNull)
        .groupBy("x", "y", "xv", "yv").agg(count(lit(1)).as("c")))
    val mx = joint.groupBy("x", "y", "xv").agg(sum("c").as("cx"))
    val my = joint.groupBy("x", "y", "yv").agg(sum("c").as("cy"))
    val tot = joint.groupBy("x", "y").agg(sum("c").as("n"))
    joint.join(mx, Seq("x", "y", "xv")).join(my, Seq("x", "y", "yv"))
      .join(broadcast(tot), Seq("x", "y"))
      .select(col("x"), col("y"), col("n"),
        (col("c") / col("n") *
          log(col("c") * col("n") / (col("cx") * col("cy")))).as("term"))
      .groupBy("x", "y", "n")
      .agg(round(sum("term"), roundTo).as("mi"))
      .select(col("x"), col("y"), col("n"), col("mi"))
  }

  /** DuckDB twin over a table. */
  def mutualInfoPairsDuckSql(table: String, cols: Seq[String], roundTo: Int = 4): String = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    pairs.map { case (x, y) =>
      s"""SELECT '$x' AS x, '$y' AS y, n, mi FROM (
         |  SELECT n, round(SUM((c / CAST(n AS DOUBLE)) * ln(c * CAST(n AS DOUBLE) / (CAST(cx AS DOUBLE) * cy))), $roundTo) AS mi
         |  FROM (
         |    SELECT CAST($x AS VARCHAR) AS xv, CAST($y AS VARCHAR) AS yv, count(*) AS c
         |    FROM $table WHERE $x IS NOT NULL AND $y IS NOT NULL GROUP BY 1, 2) joint
         |  JOIN (SELECT xv, sum(c) AS cx FROM (
         |    SELECT CAST($x AS VARCHAR) AS xv, CAST($y AS VARCHAR) AS yv, count(*) AS c
         |    FROM $table WHERE $x IS NOT NULL AND $y IS NOT NULL GROUP BY 1, 2) j2 GROUP BY xv) mx USING (xv)
         |  JOIN (SELECT yv, sum(c) AS cy FROM (
         |    SELECT CAST($x AS VARCHAR) AS xv, CAST($y AS VARCHAR) AS yv, count(*) AS c
         |    FROM $table WHERE $x IS NOT NULL AND $y IS NOT NULL GROUP BY 1, 2) j3 GROUP BY yv) my USING (yv),
         |  (SELECT count(*) AS n FROM $table WHERE $x IS NOT NULL AND $y IS NOT NULL) tot
         |  GROUP BY n) p""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
  }
}
