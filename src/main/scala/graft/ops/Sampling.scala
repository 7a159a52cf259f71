package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling — the training-data-pipeline
  * requirement `df.sample()` cannot meet: a rerun (or another engine)
  * must select the SAME rows, and membership must be decidable per row
  * without global state. Selection is a pure function of the row KEY:
  * keep iff md5-hash(key ++ salt) mod 10^6 < fraction * 10^6. Changing
  * the salt draws an independent sample; no shuffle, no RNG state, and
  * the filter composes with pushdown like any predicate.
  *
  * (Scale note: hash-based sampling is also the only way to sample
  * CONSISTENTLY across tables — sampling users in one table selects the
  * same users' rows in another.)
  */
object Sampling {

  private val Scale = 1000000L

  /** THE membership hash — the single definition both uniform and
    * stratified sampling (and both engines' twins) derive from. A
    * NULL key yields NULL (row dropped): Spark's concat propagates
    * NULL, and [[hashModDuckSql]] uses `||` for the same reason.
    */
  private def hashMod(key: Column, salt: String): Column =
    pmod(TextFunctions.portableHash60(concat(key.cast("string"), lit(salt))), lit(Scale))

  /** DuckDB twin of [[hashMod]] — `||`, NOT concat: DuckDB's concat
    * IGNORES null arguments while Spark's propagates them, which would
    * silently keep/drop every NULL-key row differently across engines.
    */
  private def hashModDuckSql(keySql: String, salt: String): String = {
    val s = salt.replace("'", "''")
    s"CAST(concat('0x', substr(md5(CAST($keySql AS VARCHAR) || '$s'), 1, 15)) AS UBIGINT) % $Scale"
  }

  /** Deterministic uniform draw in (0, 1) from the SAME membership
    * hash — the randomness source for hash-seeded samplers (Gumbel
    * top-k importance resampling). The +0.5 offset keeps the unit
    * strictly inside (0, 1) so -ln(-ln(u)) never hits ±inf.
    */
  def unitHash(key: Column, salt: String = ""): Column =
    (hashMod(key, salt).cast("double") + lit(0.5)) / lit(Scale.toDouble)

  /** DuckDB twin of [[unitHash]] — identical arithmetic order. */
  def unitHashDuckSql(keySql: String, salt: String = ""): String =
    s"((${hashModDuckSql(keySql, salt)}) + 0.5) / $Scale.0"

  /** Keep-predicate for a fraction in [0, 1]. */
  def keep(key: Column, fraction: Double, salt: String = ""): Column =
    hashMod(key, salt) < lit((fraction * Scale).toLong)

  /** Uniform deterministic sample by key. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame =
    df.filter(keep(col(keyCol), fraction, salt))

  /** Stratified deterministic sample: per-stratum fractions (strata
    * missing from the map are dropped, mirroring sampleBy).
    */
  def stratified(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      salt: String = ""): DataFrame = {
    val cases = fractions.foldLeft(lit(-1L)) { case (acc, (stratum, frac)) =>
      when(col(strataCol) === stratum, lit((frac * Scale).toLong)).otherwise(acc)
    }
    df.filter(hashMod(col(keyCol), salt) < cases)
  }

  /** DuckDB twin of the keep-predicate over a key SQL fragment. */
  def keepDuckSql(keySql: String, fraction: Double, salt: String = ""): String =
    s"${hashModDuckSql(keySql, salt)} < ${(fraction * Scale).toLong}"

  def stratifiedDuckSql(
      table: String,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      salt: String = ""): String = {
    val cases = fractions.toSeq.sortBy(_._1).map { case (stratum, frac) =>
      s"WHEN $strataCol = '${stratum.replace("'", "''")}' THEN ${(frac * Scale).toLong}"
    }.mkString(" ")
    s"""SELECT * FROM $table
       |WHERE ${hashModDuckSql(keyCol, salt)}
       |  < (CASE $cases ELSE -1 END)""".stripMargin
  }

  // ------------------------------------------------- diversity sampling

  /** Cluster-balanced diversity sample (the DataComp/SemDeDup-style
    * "cluster, then take an equal quota per cluster" subset builder):
    * per k-means cluster, keep the `quota` rows with the smallest
    * deterministic membership hash — a uniform draw WITHIN each
    * cluster, so the subset preserves the corpus's cluster structure
    * instead of its cluster-size skew (a uniform corpus sample is
    * dominated by the head clusters; this one is diverse by
    * construction). Selection is the same pure-function-of-key
    * discipline as [[sampleByKey]] (rerun/engine stable, salt draws an
    * independent sample).
    *
    * Scale shape: assignment is the map-only codegen argmin
    * ([[graft.ann.KMeans.assign]] against literal centroids); the
    * per-cluster quota cut is ONE bottom-k partial aggregate over the
    * bounded cluster key (`graft_bottom_k_struct`, (hash, id) total
    * order — the kmvDistinct lesson: no rank window ever shuffles the
    * full corpus, and the aggregate state is k·quota rows). Output:
    * (idCol, cluster), the kept rows.
    */
  def diverseSample(emb: DataFrame, idCol: String, vecCol: String,
      model: graft.ann.KMeans.Model, quota: Int,
      salt: String = ""): DataFrame = {
    require(quota >= 1, s"quota must be >= 1: $quota")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    graft.ann.KMeans.assign(emb, idCol, vecCol, model)
      .select(col("cluster"),
        struct(
          TextFunctions.portableHash60(
            concat(col(idCol).cast("string"), lit(salt))).as("h"),
          col(idCol).cast("long").as("id")).as("__s"))
      .filter(col("__s.h").isNotNull) // NULL keys are never sampled (hashMod contract)
      .groupBy("cluster")
      .agg(expr(s"graft_bottom_k_struct(__s, $quota)").as("__bk"))
      .select(col("cluster"), explode(col("__bk")).as("__e"))
      .select(col("__e.id").as(idCol), col("cluster"))
  }

  /** DuckDB twin of [[diverseSample]] over an assignment CTE/table
    * exposing (`idCol`, cluster) — the quota cut as a per-cluster rank
    * on the identical (hash, id) total order.
    */
  def diverseSampleDuckSql(assignedTable: String, idCol: String,
      quota: Int, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    val h = s"CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR) || '$s'), 1, 15)) AS UBIGINT)"
    s"""SELECT $idCol, cluster FROM (
       |  SELECT $idCol, cluster,
       |    row_number() OVER (PARTITION BY cluster ORDER BY $h ASC, $idCol ASC) AS rn
       |  FROM $assignedTable
       |  WHERE $idCol IS NOT NULL) t
       |WHERE rn <= $quota""".stripMargin
  }

  // ------------------------------------------------- train/val/test split

  /** Deterministic train/val/test split assignment from the SAME
    * membership hash: a row's split is a pure function of its key and
    * the salt, so reruns, engines, and downstream jobs all agree, and
    * adding rows never reassigns existing ones (the property random
    * splits lose). The hash is uniform within any stratum, so the
    * split is stratified by construction over every attribute.
    * `valPm`/`testPm` are per-mille integer shares (exact literals in
    * both engines); train takes the remainder. Map-only — the
    * assignment composes with pushdown like any projection.
    */
  def splitAssign(df: DataFrame, keyCol: String,
      valPm: Int = 100, testPm: Int = 100, salt: String = ""): DataFrame = {
    require(valPm >= 0 && testPm >= 0 && valPm + testPm <= 1000,
      s"val + test per-mille must fit in [0, 1000]: $valPm + $testPm")
    val m = hashMod(col(keyCol), salt) % 1000L
    df.withColumn("split",
      when(m < valPm, lit("val"))
        .when(m < valPm + testPm, lit("test"))
        .otherwise(lit("train")))
  }

  /** Deterministic k-fold assignment in [0, k): the CV analog of
    * [[splitAssign]] — fold is a pure function of (key, salt), so
    * reruns and engines agree and growth never reassigns a row.
    */
  def foldAssign(key: Column, k: Int, salt: String = ""): Column =
    hashMod(key, salt) % k.toLong

  /** DuckDB twin of [[foldAssign]]. */
  def foldAssignDuckSql(keySql: String, k: Int, salt: String = ""): String =
    s"((${hashModDuckSql(keySql, salt)}) % $k)"

  /** DuckDB twin of [[splitAssign]] (appends `split` to `table`'s
    * columns via SELECT *).
    */
  def splitAssignDuckSql(table: String, keyCol: String,
      valPm: Int = 100, testPm: Int = 100, salt: String = ""): String =
    s"""SELECT *, CASE
       |  WHEN ${hashModDuckSql(keyCol, salt)} % 1000 < $valPm THEN 'val'
       |  WHEN ${hashModDuckSql(keyCol, salt)} % 1000 < ${valPm + testPm} THEN 'test'
       |  ELSE 'train' END AS split
       |FROM $table""".stripMargin
}
