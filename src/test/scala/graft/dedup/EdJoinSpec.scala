package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ed-Join contract: the prefix/length/count filter chain is LOSSLESS
  * — the filtered join emits exactly the pairs a brute-force
  * levenshtein cross-join emits — and the native q-gram tokenizer is
  * bit-identical to the composed SQL chain the DuckDB oracle runs.
  */
class EdJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic mutation families: 12 random base strings (seeded),
  // each with an exact copy, char substitutions, an interior deletion
  // and an appended tail — intra-family distances 0..8, cross-family
  // distances far beyond the threshold
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    (0 until 12).flatMap { f =>
      val base = (1 to 45).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      Seq(
        (f * 10L, base),
        (f * 10L + 1, base),                                    // dist 0
        (f * 10L + 2, base.updated(5, '0').updated(17, '1')),   // dist <= 2
        (f * 10L + 3, base.take(10) + base.drop(14)),           // dist 4
        (f * 10L + 4, base + "0123456"))                        // dist 7
    }
  }

  test("edPairs equals the brute-force levenshtein join (blocking is lossless)") {
    val docs = corpus.toDF("id", "s")
    val scope = new graft.api.CacheScope
    val got = try {
      EdJoin.edPairs(docs, "id", "s", q = 3, d = 8, scope = scope)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally scope.release()
    val brute = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        levenshtein($"a.s", $"b.s").cast("long").as("dist"))
      .filter($"dist" <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sanity: the corpus actually exercises every distance tier
    brute.map(_._3) should contain allOf (0L, 2L, 4L, 7L)
    got shouldBe brute
  }

  test("edPairs with d=0 finds exactly the duplicate strings") {
    val docs = corpus.toDF("id", "s")
    val scope = new graft.api.CacheScope
    val got = try {
      EdJoin.edPairs(docs, "id", "s", q = 3, d = 0, scope = scope)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally scope.release()
    got shouldBe (0 until 12).map(f => (f * 10L, f * 10L + 1, 0L)).toSet
  }

  test("native q-gram tokens are bit-identical to the composed md5 SQL chain") {
    // repeated grams (occurrence encoding), multibyte code points, a
    // length-q string, and a string shorter than q (empty array)
    val texts = Seq("banana bandana banana", "ééé né ééé", "abc", "ab",
      "aaaaaaaaaa", "the same the same the same")
    val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val native = df.select(col("id"),
        posexplode(call_function("graft_qgram_hashes", col("s"), lit(3))))
      .select(col("id"), col("pos"), col("col").as("tk"))
    val composed = df.select(col("id"), posexplode(expr(
        "if(length(s) < 3, array(), transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)))")))
      .select(col("id"), col("pos"), col("col").as("gram"))
      .withColumn("occ", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id", "gram").orderBy("pos")))
      .select(col("id"), col("pos"), expr(
        "cast(conv(substr(md5(concat(gram, chr(1), cast(occ as string))), 1, 15), 16, 10) as bigint)").as("tk"))
    val n = native.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val c = composed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    n should not be empty
    n shouldBe c
    // "ab" (< q chars) contributes nothing; "abc" contributes one gram
    n.count(_._1 == 3L) shouldBe 0
    n.count(_._1 == 2L) shouldBe 1
  }

  test("edMatchTopN equals the brute-force cross-match (bases vs variants)") {
    val docs = corpus.toDF("id", "s")
    val src = docs.filter($"id" % 10 === 0)
    val tgt = docs.filter($"id" % 10 =!= 0)
    val scope = new graft.api.CacheScope
    val got = try {
      EdJoin.edMatchTopN(src, tgt, "id", "s", q = 3, d = 8, topN = 3, scope = scope)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    } finally scope.release()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_id").orderBy($"dist".asc, $"tgt_id".asc)
    val brute = src.select($"id".as("src_id"), $"s".as("sa"))
      .crossJoin(tgt.select($"id".as("tgt_id"), $"s".as("sb")))
      .select($"src_id", $"tgt_id", levenshtein($"sa", $"sb").cast("long").as("dist"))
      .filter($"dist" <= 8)
      .withColumn("match_rank", row_number().over(w))
      .filter($"match_rank" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // each family's base must rank its exact copy first
    brute.count(_._4 == 1) shouldBe 12
    got shouldBe brute
  }

  test("fuelAudit postings and pair fuel tie out against the corpus shape") {
    val docs = corpus.toDF("id", "s")
    val scope = new graft.api.CacheScope
    val rows = try {
      EdJoin.fuelAudit(docs, "id", "s", q = 3, d = 8, scope = scope).collect()
    } finally scope.release()
    // every string has >= q*d+1 grams, so each contributes exactly a
    // full 25-token prefix
    rows.map(_.getAs[Long]("n_postings")).sum shouldBe corpus.size * 25L
    // fuel identity per decade: sum_c2 = 2*n_cand_pairs + n_postings
    rows.foreach { r =>
      r.getAs[Long]("sum_c2") shouldBe
        2L * r.getAs[Long]("n_cand_pairs") + r.getAs[Long]("n_postings")
    }
    // duplicate strings share full prefixes: at least one token with
    // occupancy >= 2 must exist
    rows.map(_.getAs[Long]("max_bucket")).max should be >= 2L
  }

  test("strings shorter than q*(d+1) raise instead of silently missing pairs") {
    val docs = Seq((1L, "a" * 30), (2L, "b" * 20)).toDF("id", "s")
    val scope = new graft.api.CacheScope
    val ex = intercept[Exception] {
      try EdJoin.edPairs(docs, "id", "s", q = 3, d = 8, scope = scope).count()
      finally scope.release()
    }
    ex.getMessage should include("lossless only for strings of length >= q*(d+1)")
  }
}
