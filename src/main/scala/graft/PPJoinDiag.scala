package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off diagnostic for the PPJoin ScaleSmoke ratio: counts rows at
  * each pruning stage (prefix postings → shingle-join candidates →
  * post-positional-filter candidates → verified pairs) at 1x and Kx
  * salted corpora, to attribute the wall-clock growth to a stage.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.PPJoinDiag"
  */
object PPJoinDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = LocalSession.build()
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.df(spark, sfDir, "documents").select("doc_id", "text")

    def docsX(k: Int): DataFrame = (0 until k).map { i =>
      if (i == 0) docs
      else docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"_$i")))).as("text"))
    }.reduce(_ unionByName _)

    def stages(k: Int): Unit = {
      val threshold = 0.5
      val w = 3
      val hs = docsX(k).select(col("doc_id"),
        array_distinct(call_function("graft_hashed_shingles", col("text"), lit(w))).as("hs"))
        .filter(size(col("hs")) > 0).persist()
      val sh = hs.select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("s"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("__df"))
      val ranked = sh.join(dfreq, "s")
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("__df").asc, col("s").asc)))
      val prefix = ranked
        .filter(col("__r") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .select(col("doc_id"), col("sz"), col("s"), col("__r")).persist()
      val joined = prefix.select(col("doc_id").as("id_a"), col("sz").as("sz_a"),
          col("s"), col("__r").as("__ra"))
        .join(prefix.select(col("doc_id").as("id_b"), col("sz").as("sz_b"),
          col("s"), col("__r").as("__rb")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
      val lenOk = joined.filter(lit(threshold) * greatest(col("sz_a"), col("sz_b"))
        <= least(col("sz_a"), col("sz_b")))
      val posOk = lenOk
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(max(lit(1) + least(col("sz_a") - col("__ra"), col("sz_b") - col("__rb")))
          .as("__max_overlap"))
        .filter(col("__max_overlap") >=
          ceil(lit(threshold) / (lit(1.0) + lit(threshold)) * (col("sz_a") + col("sz_b"))))
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        System.err.println(f"[diag $k%2dx] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $r")
        r
      }
      t("postings (rows)")(sh.count())
      t("vocab (distinct shingles)")(dfreq.count())
      t("prefix postings")(prefix.count())
      t("join output (len-filtered)")(lenOk.count())
      t("distinct cand pairs pre-pos")(lenOk.select("id_a", "id_b").distinct().count())
      t("cand pairs post-positional")(posOk.count())
      t("verified pairs")(graft.dedup.NgramJaccard.jaccardPairsExact(
        docsX(k), "doc_id", "text").count())
      graft.api.CacheScope.global.release(blocking = true)
      hs.unpersist(true); prefix.unpersist(true)
    }
    stages(1)
    stages(copies)
    spark.stop()
  }
}
