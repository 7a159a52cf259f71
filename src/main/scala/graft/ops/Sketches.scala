package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Approximate sketch operators — the sub-linear scale path for
  * corpus-wide statistics a 100 TB pipeline cannot afford exactly.
  * All of these ride Spark's partial-aggregating sketch built-ins
  * (HLL++, Greenwald-Khanna/KLL, count-min-backed freqItems, Bloom):
  * one map-side sketch per partition, one tiny merge — no shuffle of
  * raw values, bounded memory at any scale. The exact counterparts
  * (`distinctValues`, `Describe.percentiles`, `Corpus.topNgrams`,
  * `Corpus.decontaminate`) stay the oracle-checked semantics; these
  * are the drop-in replacements once the exact shuffle is the
  * bottleneck.
  */
object Sketches {

  /** Approximate distinct count per column in ONE aggregation
    * (HLL++, `rsd` relative error) — the scale path for
    * `Collection.distinctValues` cardinality checks.
    * Result: one row, one `<col>_distinct` column per input column.
    */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "approxDistinct needs at least one column")
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_distinct"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate quantiles per column in ONE aggregation
    * (percentile_approx; `accuracy` trades memory for error ~1/accuracy).
    * Result: (column, probs array, quantiles array) — the scale twin
    * of Describe's exact interpolated percentiles.
    */
  def approxQuantiles(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "approxQuantiles needs at least one column")
    val probsArr = array(probs.map(lit): _*)
    // cast to double so every column yields array<double> (the map
    // explode needs one value type; percentile_approx is type-preserving)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), probsArr, lit(accuracy)).as(c))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row per column: (column, quantiles)
    wide.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("column", "quantiles")))
      .withColumn("probs", probsArr)
      .select("column", "probs", "quantiles")
  }

  /** Heavy hitters per column via Spark's single-pass freqItems
    * (support = minimum frequency share). False positives possible
    * (the count-min style guarantee), false negatives not.
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** Bloom filter over an expression's values — bounded-size set
    * membership for filter pushdown across jobs (expected items /
    * fpp size the bits). The filter itself is driver-held and
    * broadcast-friendly: ~1.2 GB for 1e9 items at 1% fpp.
    */
  def buildBloom(df: DataFrame, expr: Column, expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(expr, expectedItems, fpp)

  /** Membership-test column for a built Bloom filter (false-positive
    * rate `fpp`, never false-negative) — usable as a pre-filter that
    * keeps ALL true matches and drops ~(1-fpp) of true negatives
    * before an exact verify join.
    */
  def mightContain(df: DataFrame, bloom: BloomFilter, expr: Column): Column = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    val f = udf((v: Long) => bc.value.mightContainLong(v))
    f(expr.cast("long"))
  }
}
