package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** The round-13 model-literal kernels (BloomContains, TableSum,
  * GroupCdfRank, CosineAnyAbove) — each replaced a boxed UDF on a
  * serve-time path, so each is pinned BIT-IDENTICAL to the exact
  * driver-side arithmetic the UDF ran, plus the null semantics the
  * call sites rely on, plus proof the plan carries no ScalaUDF.
  */
class ModelKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def noUdfIn(df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect() // materialize so the executed plan exists
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "UDF"
  }

  test("graft_bloom_contains: long probes are bit-identical to BloomFilter.mightContainLong, no false negatives") {
    val rnd = new Random(42)
    val inserted = (0 until 500).map(_ => rnd.nextLong()).distinct
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(inserted.size, 0.01)
    inserted.foreach(bloom.putLong)
    val probes = inserted.take(100) ++ (0 until 400).map(_ => rnd.nextLong())
    val df = probes.toDF("v")
    val got = df.select(col("v"),
        BloomContains.probe(col("v"), bloom).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      got(p) shouldBe bloom.mightContainLong(p)
    }
    // a Bloom pre-filter must NEVER produce false negatives
    inserted.take(100).foreach(p => got(p) shouldBe true)
    noUdfIn(df.filter(BloomContains.probe(col("v"), bloom)))
  }

  test("graft_bloom_contains: string probes hash the inserted representation (mightContainString parity)") {
    val words = (1 to 300).map(i => s"tok$i")
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(words.size, 0.01)
    words.foreach(bloom.putString)
    val probes = words.take(50) ++ (1 to 50).map(i => s"missing$i")
    val got = probes.toDF("s")
      .select(col("s"), BloomContains.probe(col("s"), bloom).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach(p => got(p) shouldBe bloom.mightContainString(p))
    words.take(50).foreach(p => got(p) shouldBe true)
  }

  test("graft_bloom_contains: array<bigint> arm is any-hit; null elements skip; null array yields null") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(7L, 8L, 9L).foreach(bloom.putLong)
    val df = Seq(
      (1L, Some(Seq[java.lang.Long](1L, 2L, 7L))),   // hit via 7
      (2L, Some(Seq[java.lang.Long](1L, 2L, 3L))),   // likely miss (fpp-bounded)
      (3L, Some(Seq[java.lang.Long](null, 8L))),     // null element skipped, hit via 8
      (4L, Some(Seq.empty[java.lang.Long])),         // empty → false
      (5L, None)                                      // null array → null
    ).toDF("id", "hs")
    val got = df.select(col("id"),
        BloomContains.probe(col("hs"), bloom).as("hit"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    got(1L) shouldBe Some(true)
    got(3L) shouldBe Some(true)
    got(4L) shouldBe Some(false)
    got(5L) shouldBe None
  }

  test("graft_table_sum: bit-identical to the driver fold; null elements skip; null array yields null") {
    val rnd = new Random(7)
    val table = Array.fill(64)(rnd.nextDouble() * 4 - 2)
    val rows = (1L to 200L).map { i =>
      (i, Some(Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong().abs)))
    } :+ (0L, None)
    val df = rows.toDF("id", "hs")
    val got = df.select(col("id"), call_function("graft_table_sum",
        col("hs"), typedLit(table.toSeq)).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    rows.foreach {
      case (id, Some(hs)) =>
        var expect = 0.0
        hs.foreach(h => expect += table(java.lang.Math.floorMod(h, table.length.toLong).toInt))
        got(id) shouldBe Some(expect) // sequential fold, bit-identical
      case (id, None) => got(id) shouldBe None
    }
    noUdfIn(df.select(call_function("graft_table_sum", col("hs"), typedLit(table.toSeq))))
  }

  test("graft_cdf_rank: bit-identical to the avg-rank integer formula; unseen group and null inputs yield null") {
    val rnd = new Random(13)
    // per-group sorted cent grids with counts → (qvs, cum)
    val model: Map[String, (Array[Long], Array[Long])] =
      Seq("a", "b").map { g =>
        val qvs = (0 until 20).map(_ => rnd.nextInt(1000).toLong).distinct.sorted.toArray
        val cnts = qvs.map(_ => 1L + rnd.nextInt(9))
        val cum = new Array[Long](qvs.length + 1)
        qvs.indices.foreach(i => cum(i + 1) = cum(i) + cnts(i))
        g -> ((qvs, cum))
      }.toMap
    val bytes = GroupCdfRank.encode(model)
    val probes: Seq[(String, java.lang.Long)] =
      (0 until 300).map(_ => (Seq("a", "b", "zzz")(rnd.nextInt(3)),
        java.lang.Long.valueOf(rnd.nextInt(1200).toLong))) ++
        Seq((null, java.lang.Long.valueOf(5L)), ("a", null))
    val got = probes.toDF("g", "qv")
      .select(col("g"), col("qv"),
        call_function("graft_cdf_rank", col("g"), col("qv"), lit(bytes)).as("qn"))
      .collect().map(r => (Option(r.getString(0)), Option(r.get(1)), Option(r.get(2))))
    got.foreach { case (g, qv, qn) =>
      val expect: Option[Double] = for {
        gg <- g; v <- qv; m <- model.get(gg)
      } yield {
        val (qvs, cum) = m
        val idx = java.util.Arrays.binarySearch(qvs, v.asInstanceOf[Long])
        val p = if (idx >= 0) cum(idx) + cum(idx + 1) + 1 else 2L * cum(-idx - 1) + 1
        val q = 2L * (cum(qvs.length) + 1)
        ((20000L * p + q) / (2L * q)).toDouble / 10000.0
      }
      qn shouldBe expect
      // monotone-in-value and inside (0, 1) — the serve contract
      expect.foreach { e => e should be > 0.0; e should be < 1.0 }
    }
  }

  test("graft_cosine_any: bit-identical 4dp-rounded cosine-any-above; zero-norm rows never hit; null vec yields null") {
    val rnd = new Random(99)
    val evalVecs: Seq[Seq[Double]] =
      (0 until 8).map(_ => Seq.fill(16)(rnd.nextDouble() * 2 - 1)) :+
        Seq.fill(16)(0.0) // zero-norm eval row must never hit
    val threshold = 0.8
    val rows: Seq[(Long, Option[Seq[Double]])] =
      (1L to 60L).map(i => (i, Some(
        if (i % 5 == 0) evalVecs((i % 8).toInt).map(_ * 3.0) // exact direction → cosine 1
        else Seq.fill(16)(rnd.nextDouble() * 2 - 1)))) ++
        Seq((0L, None), (-1L, Some(Seq.fill(16)(0.0))))
    val got = rows.toDF("id", "v")
      .select(col("id"), call_function("graft_cosine_any",
        col("v"), typedLit(evalVecs), lit(threshold)).as("hit"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    def driverHit(arr: Seq[Double]): Boolean = {
      val n = math.sqrt(arr.map(x => x * x).sum)
      evalVecs.exists { ev =>
        val en = math.sqrt(ev.map(x => x * x).sum)
        n > 0 && en > 0 && {
          val d = arr.zip(ev).map { case (x, y) => x * y }.sum
          BigDecimal.decimal(d / (n * en))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= threshold
        }
      }
    }
    rows.foreach {
      case (id, Some(v)) => got(id) shouldBe Some(driverHit(v))
      case (id, None) => got(id) shouldBe None
    }
    got(-1L) shouldBe Some(false) // zero-norm input never hits
    (1L to 60L).filter(_ % 5 == 0).foreach(i => got(i) shouldBe Some(true))
  }

  test("zero ScalaUDF nodes anywhere in the four serve-time stream ops' plans") {
    // the round-12 verdict's house-style item: every kernel path stays
    // codegen-native end to end
    val corpus = (1L to 400L).map(i =>
      (s"g${i % 3}", i.toDouble % 37, s"w${i % 11} w${i % 7} common")).toDF("g", "v", "text")
    val evalDf = (1L to 5L).map(i => (i, Seq.fill(8)(i.toDouble / 10)))
      .toDF("id", "embedding")
    val stream = (1L to 50L).map(i =>
      (s"g${i % 4}", i.toDouble % 41, s"w${i % 13} common", Seq.fill(8)(i.toDouble / 9)))
      .toDF("g", "v", "text", "embedding")
    noUdfIn(graft.streaming.StreamOps.winsorizeStream(stream, corpus, "g", "v"))
    noUdfIn(graft.streaming.StreamOps.quantileNormalizeStream(stream, corpus, "g", "v"))
    noUdfIn(graft.streaming.StreamOps.importanceScoreStream(stream, corpus, "text",
      col("g") === "g0"))
    noUdfIn(graft.streaming.StreamOps.decontaminateEmbedStream(stream, evalDf,
      "embedding", "embedding", threshold = 0.95))
    noUdfIn(graft.streaming.StreamOps.decontaminateStream(stream, corpus, "text", "text", w = 2))
  }
}
