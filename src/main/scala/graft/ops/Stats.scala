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

  /** Revenue-concentration summary over a high-cardinality key (the
    * Lorenz-curve digest: Gini + top-decile share — "do 10% of the
    * customers carry the book?"). Scale-correct global rank: the
    * [[Corpus.zipfFit]] range-partition + per-partition row_number +
    * broadcast-offset prefix sum — NO partition-less window, and no
    * collect_list of the key domain (the bounded-domain
    * `Lexical.sourceGini` shape would put every customer in one row).
    * Amounts cent-quantize to exact longs; Gini uses the identity
    * Σ(2i−n−1)·tᵢ = 2·Σ(i·tᵢ) − (n+1)·Σt with the i·t products summed
    * in DECIMAL(38,0) (order-independent, overflow-proof), and n is
    * driver-known from the partition counts, so the top-decile cutoff
    * is a literal. Final ratios divide exact integers as doubles —
    * full-entropy quotients, not boundary-prone count ratios.
    */
  def concentration(df: DataFrame, keyCol: String, amtCol: String,
      outKeyCnt: String = "n_keys"): DataFrame = {
    val per = df.groupBy(keyCol)
      .agg(sum(floor(col(amtCol) * 100 + 0.5).cast("long")).as("t"))
      .repartitionByRange(col("t").asc, col(keyCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      val cnts = per.groupBy("__pid").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = cnts.map(_._2).sum
      val offsets = cnts.map(_._2).scanLeft(0L)(_ + _).init
      val offMap = map(cnts.map(_._1).zip(offsets).flatMap {
        case (pid, off) => Seq(lit(pid), lit(off))
      }.toSeq: _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__pid").orderBy(col("t").asc, col(keyCol).asc)
      val ranked = per.withColumn("i",
        row_number().over(w).cast("long") + element_at(offMap, col("__pid")))
      val agg = ranked.agg(
          sum("t").as("tot"),
          sum((col("i") * col("t")).cast("decimal(38,0)")).as("sit"),
          sum(when(col("i") > lit(n - n / 10), col("t"))).as("top_cents"))
        .select(lit(n).as(outKeyCnt), col("tot").as("total_cents"),
          round((lit(2).cast("decimal(38,0)") * col("sit")
              - lit(n + 1).cast("decimal(38,0)") * col("tot").cast("decimal(38,0)"))
            .cast("double")
            / (lit(n).cast("decimal(38,0)") * col("tot").cast("decimal(38,0)"))
              .cast("double"), 4).as("gini"),
          round(col("top_cents").cast("double") / col("tot").cast("double"), 4)
            .as("top10_share"))
      // materialize before unpersist: the broadcast offsets are bound
      // to THIS materialization of the range partitioning
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally per.unpersist()
  }

  /** DuckDB twin of [[concentration]] (the referee ranks with a plain
    * global window).
    */
  def concentrationDuckSql(table: String, keyCol: String, amtCol: String,
      outKeyCnt: String = "n_keys"): String =
    s"""WITH per AS (
       |  SELECT $keyCol AS k,
       |    CAST(sum(CAST(floor($amtCol * 100 + 0.5) AS BIGINT)) AS BIGINT) AS t
       |  FROM $table GROUP BY $keyCol),
       |r AS (
       |  SELECT t, CAST(row_number() OVER (ORDER BY t, k) AS BIGINT) AS i,
       |    CAST(count(*) OVER () AS BIGINT) AS n,
       |    CAST(sum(t) OVER () AS BIGINT) AS tot
       |  FROM per)
       |SELECT CAST(max(n) AS BIGINT) AS $outKeyCnt,
       |  CAST(max(tot) AS BIGINT) AS total_cents,
       |  round(CAST(2 * sum(i * t) - (max(n) + 1) * max(tot) AS DOUBLE)
       |    / CAST(max(n) * max(tot) AS DOUBLE), 4) AS gini,
       |  round(CAST(sum(CASE WHEN i > n - n // 10 THEN t END) AS DOUBLE)
       |    / CAST(max(tot) AS DOUBLE), 4) AS top10_share
       |FROM r""".stripMargin

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
