package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  // small 4-dim corpus; id 1 is the query, id 5 is its exact duplicate
  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),
    (5L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k orders by cosine, exact dup first") {
    val r = Knn.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 1L, k = 4)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    r.head shouldBe (5L, 1.0)
    r.map(_._1) shouldBe Array(5L, 2L, 3L, 4L)
    r.last._2 shouldBe -1.0
  }

  test("sign-bit signatures band identically for identical vectors") {
    val bk = Knn.bandedSignBits(vecs, "vec_id", "embedding", nBits = 4, bands = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val s1 = bk.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted
    val s5 = bk.filter(_._1 == 5L).map(t => (t._2, t._3)).sorted
    s1 shouldBe s5
  }

  test("lsh top-k finds the exact duplicate (shares all bands)") {
    val r = Knn.lshTopK(vecs, "vec_id", "embedding", queryId = 1L, k = 4,
      nBits = 4, bands = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    r.head shouldBe (5L, 1.0)
  }

  test("multi-probe lsh recovers a neighbor one sign-flip away from the query bucket") {
    // query [1,0.1,0,0] and its near-neighbor [1,-0.1,0,0] differ in
    // exactly one sign bit (dim 2): plain single-bucket LSH with one
    // band misses it, multi-probe finds it
    val vs = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),   // query
      (2L, Seq(1.0f, -0.1f, 0.0f, 0.0f)),  // Hamming-1 from query
      (3L, Seq(-1.0f, -1.0f, -1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val plain = Knn.lshTopK(vs, "vec_id", "embedding", queryId = 1L, k = 3,
      nBits = 4, bands = 1).collect().map(_.getLong(0))
    plain should not contain 2L
    val multi = Knn.lshTopKMultiProbe(vs, "vec_id", "embedding", queryId = 1L, k = 3,
      nBits = 4, bands = 1).collect().map(_.getLong(0))
    multi should contain(2L)
    multi should not contain 3L // 4 sign flips away — not probed
  }

  test("ivf top-k probes only the nearest cells and finds the exact duplicate") {
    // centroids = first 3 ids -> c1=[1,0,0,0], c2=[.9,.1,0,0],
    // c3=[0,1,0,0]. Assignments by argmax dot: v1,v2,v5 -> cell 1;
    // v3 and v4 -> cell 3. Query [1,0,0,0] probes cell 1 first.
    val r = Knn.ivfTopK(vecs, "vec_id", "embedding", queryId = 1L, k = 4,
      nCells = 3, nProbe = 1)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    r.head shouldBe (5L, 1.0)
    // ids 3 and 4 live in the unprobed cell -> never become candidates
    r.map(_._1).toSet shouldBe Set(5L, 2L)
    // nProbe = all cells degrades to exact brute force
    val all = Knn.ivfTopK(vecs, "vec_id", "embedding", queryId = 1L, k = 4,
      nCells = 3, nProbe = 3)
      .collect().map(x => x.getLong(0))
    all shouldBe Array(5L, 2L, 3L, 4L)
    // ids far from zero still get centroids (no silent empty result)
    val shifted = vecs.withColumn("vec_id", $"vec_id" + 1000L)
    Knn.ivfTopK(shifted, "vec_id", "embedding", queryId = 1001L, k = 4,
      nCells = 3, nProbe = 3)
      .collect().map(_.getLong(0)) shouldBe Array(1005L, 1002L, 1003L, 1004L)
  }

  test("findMatches: top-1 target per source with deterministic tie-break") {
    val src = vecs.filter($"vec_id" <= 2)
    val tgt = vecs.filter($"vec_id" >= 3)
    val r = Knn.findMatches(src, tgt, "vec_id", "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    r.map(_._1) shouldBe Array(1L, 2L)
    // source 1 = [1,0,0,0]: best target is its duplicate id 5 (score 1)
    r(0)._2 shouldBe 5L
    r(0)._3 shouldBe 1.0
  }

  test("findMatchesLsh: exact duplicate shares every band and wins the re-rank") {
    val src = vecs.filter($"vec_id" <= 2)
    val tgt = vecs.filter($"vec_id" >= 3)
    val r = Knn.findMatchesLsh(src, tgt, "vec_id", "embedding", nBits = 4, bands = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    // source 1 = [1,0,0,0]: its duplicate id 5 shares all bands, scores 1.0
    val m1 = r.find(_._1 == 1L).get
    m1._2 shouldBe 5L
    m1._3 shouldBe 1.0
    // no BroadcastNestedLoopJoin anywhere — the point of the tier
    val plan = Knn.findMatchesLsh(src, tgt, "vec_id", "embedding", nBits = 4, bands = 2)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("scaled match banding draws planes from the data's own dim (duck-twin parity)") {
    // 4-dim corpus: before the round-10 ADVICE fix the Spark side
    // sampled planes from a hardcoded 64-dim domain (out-of-range
    // indices read as constant-0 bits) while the Duck twin sampled
    // from the caller's dim — buckets diverged for any dim != 64.
    // Expected chunks replay scaledChunk0Duck's arithmetic in Scala
    // from the SAME bandPlanes(dim, ...) the twin inlines.
    Knn.inferDims(vecs, vecs, "embedding") shouldBe 4
    val width = Knn.widthForCount(vecs.count())
    val w = math.min(4, width) // min(maxWidth, dims) clamp at dims = 4
    val planes = Knn.bandPlanes(4, 8, 4)
    val expected = (for {
      r <- vecs.collect()
      (idxs, b) <- planes.zipWithIndex
    } yield {
      val v = r.getSeq[Float](1)
      val chunk = idxs.take(w).zipWithIndex.map { case (idx, j) =>
        if (v(idx - 1) > 0) 1L << j else 0L
      }.sum
      (r.getLong(0), b, chunk)
    }).toSet
    val got = Knn.scaledBandChunks(vecs, "vec_id", "embedding", width,
      bands = 8, dims = Knn.inferDims(vecs, vecs, "embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    got shouldBe expected
  }

  test("findMatchesLsh/findMatchesLshTopN default scaled path on a non-64-dim corpus") {
    // end-to-end through inferDims: the exact duplicate shares every
    // sampled-plane band at the data's own dim and wins the re-rank
    val src = vecs.filter($"vec_id" <= 2)
    val tgt = vecs.filter($"vec_id" >= 3)
    val m1 = Knn.findMatchesLsh(src, tgt, "vec_id", "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .find(_._1 == 1L).get
    m1._2 shouldBe 5L
    m1._3 shouldBe 1.0
    val l1 = Matcher.findMatchesLshTopN(src, tgt, "vec_id", "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .find(_._1 == 1L).get
    l1._2 shouldBe 5L
  }

  test("embedding near-dup pairs finds the duplicate pair via banding") {
    val pairs = Knn.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.95,
      bands = 2, maxWidth = 2, dims = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    pairs.map(p => (p._1, p._2)) should contain(1L, 5L)
    pairs.find(p => p._1 == 1L && p._2 == 5L).get._3 shouldBe 1.0
    // orthogonal/opposite vectors never pair at 0.95
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 4L))
  }

  test("near-dup banding width scales with the corpus count") {
    // one bit per doubling past 2^8, clamped to [8, 28]: average
    // band-bucket occupancy ≈ 1 at every decade (the occupancy-3
    // version of this ladder still grew ~30x across the sf1→sf10
    // decade on skewed real-embedding sign patterns; the 24-bit clamp
    // measurably saturated at the x1000 = 20M-vector decade — hottest
    // bucket 16k > the 10k cap — hence 28)
    Knn.widthForCount(0L) shouldBe 8
    Knn.widthForCount(256L) shouldBe 8
    Knn.widthForCount(257L) shouldBe 9
    Knn.widthForCount(1024L) shouldBe 10
    Knn.widthForCount(40000L) shouldBe 16     // the sf1 q_dedup_embed regime
    Knn.widthForCount(200000L) shouldBe 18    // the sf1→sf10 smoke regime
    Knn.widthForCount(2000000L) shouldBe 21   // x100 audit regime — unchanged by the 28 re-widen
    Knn.widthForCount(20000000L) shouldBe 25  // x1000: was clamped to 24 (occupancy > 1, cap-breaking)
    Knn.widthForCount(Long.MaxValue / 2) shouldBe 28
  }

  test("band planes are deterministic, distinct within a band, in range") {
    val p1 = Knn.bandPlanes(64, 8, 16)
    val p2 = Knn.bandPlanes(64, 8, 16)
    p1.map(_.toSeq).toSeq shouldBe p2.map(_.toSeq).toSeq
    p1.length shouldBe 8
    p1.foreach { band =>
      band.length shouldBe 16
      band.toSet.size shouldBe 16             // no duplicate dim in a band
      all(band.toSeq) should (be >= 1 and be <= 64)
    }
    // bands differ from each other (sampling actually varies per band)
    p1.map(_.toSeq).toSet.size shouldBe 8
    // dims < width: the band caps at dims distinct indices
    Knn.bandPlanes(4, 2, 16).foreach(_.toSet.size shouldBe 4)
  }

  test("exact duplicates pair at EVERY width (they share all sign bits)") {
    import spark.implicits._
    val base = (0L until 40L).map { i =>
      (i, Seq.tabulate(64)(d => (math.sin(i * 13.7 + d * 0.91) * 2).toFloat))
    }
    val dup = base.map { case (i, v) => (i + 1000L, v) }
    val df = (base ++ dup).toDF("vec_id", "embedding")
    for (w <- Seq(8, 12, 16)) {
      val pairs = Knn.nearDupPairs(df, "vec_id", "embedding", threshold = 0.999,
        widthOverride = Some(w))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      base.foreach { case (i, _) => pairs should contain((i, i + 1000L)) }
    }
  }

  test("knn classification takes the majority label of the neighbors") {
    // two clean clusters around e1 and e2; probes 10/11 sit in them
    val labeled = Seq(
      (1L, Seq(1.0f, 0.05f, 0f, 0f), 0), (2L, Seq(0.9f, -0.05f, 0f, 0f), 0),
      (3L, Seq(0.95f, 0.02f, 0f, 0f), 0),
      (4L, Seq(0.05f, 1.0f, 0f, 0f), 1), (5L, Seq(-0.03f, 0.9f, 0f, 0f), 1),
      (6L, Seq(0.01f, 0.95f, 0f, 0f), 1),
      (10L, Seq(0.99f, 0.0f, 0f, 0f), 0), // probe, true label 0
      (11L, Seq(0.0f, 0.99f, 0f, 0f), 1)  // probe, true label 1
    ).toDF("vec_id", "embedding", "label")
    val r = Knn.classifyKnn(labeled, "vec_id", "embedding", "label",
      probePred = col("vec_id") >= 10L, k = 3)
      .as[(Long, Int, Int, Boolean)].collect()
    r shouldBe Array((10L, 0, 0, true), (11L, 1, 1, true))
  }

  test("knn classification: NULL-predicate rows land in train, not nowhere") {
    // tag is NULL for ids 2/3 — (tag = 'probe') evaluates to NULL there;
    // those rows must still serve as train neighbors. The majority vote
    // DEPENDS on them: with nulls dropped from both sides (the old
    // behavior) the only neighbor is id 1 (label 1) and the prediction
    // flips to 1.
    val labeled = Seq(
      (1L, Seq(1.0f, 0.05f, 0f, 0f), 1, Some("train")),
      (2L, Seq(0.9f, -0.05f, 0f, 0f), 0, None),
      (3L, Seq(0.95f, 0.02f, 0f, 0f), 0, None),
      (10L, Seq(0.99f, 0.0f, 0f, 0f), 0, Some("probe"))
    ).toDF("vec_id", "embedding", "label", "tag")
    val r = Knn.classifyKnn(labeled, "vec_id", "embedding", "label",
      probePred = col("tag") === "probe", k = 3)
      .as[(Long, Int, Int, Boolean)].collect()
    r shouldBe Array((10L, 0, 0, true))
  }

  test("decontaminateEmbed flags exact and near leaks, spares the rest") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact copy of eval 100
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),  // near-paraphrase of eval 100
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),   // clean
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))   // anti-correlated: clean
    ).toDF("vec_id", "embedding")
    val eval = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Knn.decontaminateEmbed(train, eval, "vec_id", "embedding",
      threshold = 0.95, nBits = 4, bands = 2)
      .as[(Long, Boolean)].collect().sorted
    r shouldBe Array((1L, true), (2L, true), (3L, false), (4L, false))
  }

  test("matcherBucketLoadAudit: sum cs*ct equals the matcher banding's exact pre-cap candidate count") {
    // seeded random two-sided corpus; the audit's n_cand_pairs must be
    // the EXACT size of the (band, chunk)-keyed src x tgt join the
    // matcher would feed its re-rank (before maxBucket and distinct)
    val rnd = new scala.util.Random(5)
    def side(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val src = side(0 until 40)
    val tgt = side(1000 until 1060)
    val width = Knn.widthForCount(60L)
    val audit = Knn.matcherBucketLoadAudit(src, tgt, "vec_id", "embedding",
        dims = 8, widthOverride = Some(width))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    // reference: the matcher's own banding, joined per band
    def bandsOf(df: org.apache.spark.sql.DataFrame, id: String) =
      Knn.scaledBandChunks(df, "vec_id", "embedding", width, bands = 8, dims = 8)
        .select(col("band"), col("chunk"), col("vec_id").as(id))
    val pairsPerBand = bandsOf(src, "src_id")
      .join(bandsOf(tgt, "tgt_id"), Seq("band", "chunk"))
      .groupBy("band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { b =>
      val (nBuckets, nSrc, nTgt, candPairs) = audit(b)
      candPairs shouldBe pairsPerBand.getOrElse(b, 0L)
      nSrc shouldBe 40L
      nTgt shouldBe 60L
      nBuckets should be <= candPairs.max(1L) // co-occupied buckets each feed >= 1 pair
    }
  }

  test("matcherBucketLoadAudit: an exact cross-side duplicate co-occupies every band") {
    val src = Seq((1L, Seq(1.0f, 0.5f, -0.25f, 0.75f))).toDF("vec_id", "embedding")
    val tgt = Seq((2L, Seq(2.0f, 1.0f, -0.5f, 1.5f)),   // same direction: same sign bits
                  (3L, Seq(-1.0f, -1.0f, 1.0f, -1.0f))).toDF("vec_id", "embedding")
    val audit = Knn.matcherBucketLoadAudit(src, tgt, "vec_id", "embedding", dims = 4)
      .collect()
    audit.length shouldBe 8
    // the duplicate shares every sign bit, hence every band's bucket:
    // each band carries at least the one (src, dup) candidate
    audit.foreach { r => r.getAs[Long]("n_cand_pairs") should be >= 1L }
  }
}
