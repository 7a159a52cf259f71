package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1, "img", "abcdefgh"), (2, "img", "zzzzzzzz"), (3, "aud", "abcdefgh")
  ).toDF("id", "kind", "payload")
    .withColumn("media", col("payload").cast("binary"))
    .withColumn("meta", struct(lit("png").as("format"),
      lit(64).as("width"), lit(64).as("height")))
    .drop("payload")

  test("binary media column carries the typed metadata struct") {
    media.schema("media").dataType.typeName shouldBe "binary"
    media.select("meta.format").as[String].collect().toSet shouldBe Set("png")
  }

  test("decodeFeatures appends a fixed-dim float vector per row, deterministically") {
    val out = Multimodal.decodeFeatures(media, "media", dim = 8)
    out.columns should contain("features")
    val feats = out.orderBy("id").select("features").as[Seq[Float]].collect()
    feats.foreach(_.length shouldBe 8)
    // identical payloads (ids 1 and 3) -> identical features
    feats(0) shouldBe feats(2)
    feats(0) should not be feats(1)
    // a second run is bit-identical (the fake decoder is deterministic)
    val again = Multimodal.decodeFeatures(media, "media", dim = 8)
      .orderBy("id").select("features").as[Seq[Float]].collect()
    again shouldBe feats
  }

  test("decodeFeatures preserves nulls and the original schema prefix") {
    val withNull = media.withColumn("media",
      when(col("id") === 2, lit(null).cast("binary")).otherwise(col("media")))
    val out = Multimodal.decodeFeatures(withNull, "media", dim = 4).orderBy("id").collect()
    out(1).isNullAt(out(1).fieldIndex("features")) shouldBe true
    out(0).getAs[Seq[Float]]("features").length shouldBe 4
  }

  test("frameSample slices fixed-size frames and keeps every Nth") {
    val r = media.filter($"id" === 1)
      .select(Multimodal.frameSample(col("media"), frameSize = 2, everyN = 2).as("frames"))
      .as[Seq[Array[Byte]]].collect().head
    // payload 'abcdefgh' -> frames ab cd ef gh -> every 2nd from 0: ab, ef
    r.map(new String(_)) shouldBe Seq("ab", "ef")
  }

  test("frameSample yields no frames for an empty payload") {
    val r = Seq("").toDF("p").withColumn("b", col("p").cast("binary"))
      .select(Multimodal.frameSample(col("b"), frameSize = 2, everyN = 1).as("frames"))
      .as[Seq[Array[Byte]]].collect().head
    r shouldBe empty
  }

  test("resizeMeta rewrites dimensions without touching the payload") {
    val out = Multimodal.resizeMeta(media, "meta", 32, 16)
    out.select("meta.width").as[Int].collect().toSet shouldBe Set(32)
    out.select("meta.height").as[Int].collect().toSet shouldBe Set(16)
    out.select(org.apache.spark.sql.functions.length(col("media")))
      .as[Int].collect().toSet shouldBe Set(8)
  }

  test("the real decoder is an explicit unimplemented hook") {
    an[NotImplementedError] should be thrownBy
      Multimodal.RealDecoder.features(Array[Byte](1, 2), 4)
  }
}
