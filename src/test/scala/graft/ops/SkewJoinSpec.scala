package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1 to 2000).map { i =>
    // key 7 is hot: ~half the fact rows land on it
    val k = if (i % 2 == 0) 7 else i % 50
    (k, i, i * 3 % 100)
  }.toDF("fk", "row_id", "v")

  private def dim = (0 until 50).map(k => (k, s"d$k")).toDF("dk", "name")

  test("salted inner join is row-identical to the plain join") {
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "row_id", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInner(fact, dim, "fk", "dk",
        saltOn = col("row_id"), s = 8)
      .select("fk", "row_id", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    salted shouldBe plain
    // 1000 even rows + the 40 odd rows with i % 50 == 7
    salted.count(_._1 == 7) shouldBe 1040
  }

  test("salted join spreads a hot key across salt buckets") {
    val l = fact.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)))
    val buckets = l.filter(col("fk") === 7)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    buckets.length shouldBe 8
    // no bucket holds more than half the hot key's rows
    buckets.max.toDouble / buckets.sum should be < 0.5
  }

  test("bloom-prefiltered join is row-identical to the plain join") {
    val selective = dim.filter(col("dk") < 5)
    val plain = fact.join(selective, col("fk") === col("dk"))
      .select("fk", "row_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val bloomed = SkewJoin.bloomInner(fact, selective, "fk", "dk",
        expectedRightKeys = 100L)
      .select("fk", "row_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    bloomed shouldBe plain
  }

  test("bloom-prefiltered join on a STRING key is row-identical (no false negatives)") {
    // the regression this pins: a string key probed through the old
    // cast-to-long path hashed a different representation than the
    // build inserted and silently dropped matching rows
    val sFact = fact.select(concat(lit("k"), col("fk")).as("fk"), col("row_id"))
    val sDim = dim.filter(col("dk") < 5)
      .select(concat(lit("k"), col("dk")).as("dk"), col("name"))
    val plain = sFact.join(sDim, col("fk") === col("dk"))
      .select("fk", "row_id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val bloomed = SkewJoin.bloomInner(sFact, sDim, "fk", "dk",
        expectedRightKeys = 100L)
      .select("fk", "row_id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    bloomed shouldBe plain
    plain.size should be > 0
  }

  test("bloom membership fails fast on an unsupported key type") {
    val d = dim.select(col("dk").cast("double").as("dk"))
    val bloom = Sketches.buildBloom(dim, col("dk"), 100L)
    an[IllegalArgumentException] should be thrownBy
      Sketches.mightContain(d, bloom, col("dk"))
  }

  test("bloom prefilter drops most non-matching fact rows before the join") {
    val selective = dim.filter(col("dk") < 5)
    val bloom = Sketches.buildBloom(selective, col("dk"), 100L, fpp = 0.01)
    val kept = fact.filter(Sketches.mightContain(fact, bloom, col("fk"))).count()
    val matching = fact.filter(col("fk") < 5).count()
    kept should be >= matching
    // fpp 1% on 2000 rows: a handful of false positives at most
    kept.toDouble should be <= matching + 200.0
  }

  test("keySkew reports hand-computable skew facts and salt fan-out") {
    // 10 keys: key 0 carries 91 rows, keys 1-9 carry 1 each → 100 rows
    val df = ((1 to 91).map(_ => 0) ++ (1 to 9)).zipWithIndex
      .toDF("k", "i")
    val r = SkewJoin.keySkew(df, "k", "t.k", partitions = 4)
      .collect().head
    r.getAs[String]("tbl_key") shouldBe "t.k"
    r.getAs[Long]("n_rows") shouldBe 100L
    r.getAs[Long]("n_keys") shouldBe 10L
    r.getAs[Long]("max_cnt") shouldBe 91L
    // only key 0 exceeds 2x the average of 10
    r.getAs[Long]("n_hot_keys") shouldBe 1L
    // 91 / (100/10) = 9.1x the average key
    r.getAs[Double]("imbalance") shouldBe 9.1
    r.getAs[Long]("top_share_ppm") shouldBe 910000L
    // ceil(91 * 4 / 100) = 4: the hot key needs the full fan-out
    r.getAs[Long]("salt_reco") shouldBe 4L
  }

  test("keySkew on a uniform low-cardinality key flags the idle-partition case") {
    val df = (1 to 400).map(i => (i % 8, i)).toDF("k", "i")
    val r = SkewJoin.keySkew(df, "k", "u.k", partitions = 32)
      .collect().head
    r.getAs[Double]("imbalance") shouldBe 1.0
    r.getAs[Long]("n_hot_keys") shouldBe 0L
    // ceil(50 * 32 / 400) = 4: even a UNIFORM key wants fan-out when
    // its cardinality (8) is below the partition count (32) — each
    // key's rows serialize in one task while 24 partitions idle.
    // salt_reco measures hot-key load vs the ideal partition load, so
    // it catches the low-cardinality case imbalance alone misses.
    r.getAs[Long]("salt_reco") shouldBe 4L
  }
}
