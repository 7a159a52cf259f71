package graft

import org.apache.spark.sql.functions._

/** One-off diagnostic for the Ed-Join wall clock (the PPJoinDiag
  * convention): times each stage of [[graft.dedup.EdJoin.edPairs]]'
  * pipeline in isolation at the given SF dir — tokens pin, df
  * aggregate, prefix aggregate, banded self-join + positional filter,
  * count-filter verify — so an optimization round attributes the cost
  * to a stage instead of guessing.
  *
  * Run: SPARK_GRAFT_SF_DIR=testdata/sf1 tools/run_main.sh graft.EdJoinDiag
  */
object EdJoinDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = 3
    val d = 8
    val spark = LocalSession.build()
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.df(spark, sfDir, "documents")
    val minLen = q * (d + 1)
    val prefixLen = q * d + 1

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[edjoindiag] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $r")
      r
    }

    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("__id"), col("text").as("__s"),
        length(col("text")).as("__len"),
        when(length(col("text")) >= minLen,
          call_function("graft_qgram_hashes", col("text"), lit(q)))
          .otherwise(raise_error(lit("short"))).as("__tk"))
      .persist()
    t("tokens pin (rows)")(toks.count())
    val sh = toks.select(col("__id"), col("__len"),
      size(col("__tk")).as("__ga"), explode(col("__tk")).as("__t"))
    t("postings (rows)")(sh.count())
    val dfreq = sh.groupBy("__t").agg(count(lit(1)).as("__df"))
    t("vocab (distinct grams)")(dfreq.count())
    val byId = sh.join(dfreq, "__t")
      .groupBy("__id", "__len", "__ga")
      .agg(slice(array_sort(collect_list(struct(col("__df"), col("__t")))),
        1, prefixLen).as("__ps"))
    val prefix = byId
      .select(col("__id"), col("__len"), col("__ga"),
        posexplode(col("__ps")).as(Seq("__r0", "__p")))
      .select(col("__id"), col("__len"), col("__ga"),
        col("__p.__t").as("__t"), (col("__r0") + 1).cast("int").as("__r"))
      .persist()
    t("prefix postings (pin)")(prefix.count())
    val bw = math.max(d, 1)
    val cand = prefix.select(col("__id").as("id_a"), col("__len").as("__la"),
        col("__ga").as("__gaa"), col("__t"), col("__r").as("__ra"),
        expr(s"__len div $bw").as("__bd"))
      .join(prefix.select(col("__id").as("id_b"), col("__len").as("__lb"),
        col("__ga").as("__gab"), col("__t"), col("__r").as("__rb"))
        .withColumn("__bd", explode(array(
          expr(s"__lb div $bw") - 1, expr(s"__lb div $bw"),
          expr(s"__lb div $bw") + 1))), Seq("__t", "__bd"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("__la") - col("__lb")) <= lit(d))
      .groupBy("id_a", "id_b", "__gaa", "__gab")
      .agg(max(lit(1) + least(col("__gaa") - col("__ra"),
        col("__gab") - col("__rb"))).as("__maxov"))
      .filter(col("__maxov") >= greatest(col("__gaa"), col("__gab")) - lit(q * d))
      .select("id_a", "id_b", "__gaa", "__gab")
    val candP = cand.persist()
    t("cand pairs post-positional")(candP.count())
    val counted = candP
      .join(toks.select(col("__id").as("id_a"), col("__tk").as("__tka"),
        col("__s").as("__sa")), "id_a")
      .join(toks.select(col("__id").as("id_b"), col("__tk").as("__tkb"),
        col("__s").as("__sb")), "id_b")
      .withColumn("__inter",
        call_function("graft_contained_count", col("__tka"), col("__tkb")))
      .filter(col("__inter") >= greatest(col("__gaa"), col("__gab")) - lit(q * d))
    val countedP = counted.persist()
    t("count-filter survivors")(countedP.count())
    t("levenshtein verified")(countedP
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), d).cast("long"))
      .filter(col("dist") >= 0).count())
    t("full edPairs (fresh)")(graft.dedup.EdJoin.edPairs(
      docs, "doc_id", "text", q = q, d = d).count())
    graft.api.CacheScope.global.release(blocking = true)
    toks.unpersist(true); prefix.unpersist(true)
    candP.unpersist(true); countedP.unpersist(true)
    spark.stop()
  }
}
