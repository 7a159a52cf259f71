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

  test("grayscale PNG roundtrip recovers exact pixel bytes and stats") {
    val bytes = Array.tabulate[Byte](64)(i => (i * 3 % 251).toByte)
    val png = Multimodal.encodeGrayPng(bytes, 8, 8)
    // a real PNG container, recognized by the imageio registry
    png.take(4).map(_ & 0xff) shouldBe Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    val s = Multimodal.imageStats(png).get
    s.format shouldBe "png"
    (s.width, s.height, s.channels) shouldBe ((8, 8, 1))
    val px = bytes.map(b => (b & 0xff).toDouble)
    s.channelMean.head shouldBe (px.sum / 64.0) +- 1e-9
    val mean = px.sum / 64.0
    val variance = px.map(v => (v - mean) * (v - mean)).sum / 64.0
    s.channelStd.head shouldBe math.sqrt(variance) +- 1e-9
  }

  test("dHash64 encodes horizontal gradient signs, row-major") {
    // row pattern 0,10,20,…,70 strictly increasing: every one of the
    // 7 bits per row is set -> 56 ones
    val inc = Array.tabulate[Byte](64)(i => ((i % 8) * 10).toByte)
    Multimodal.dHash64(Multimodal.encodeGrayPng(inc, 8, 8)).get shouldBe ((1L << 56) - 1)
    // flat image: no gradients, hash 0
    Multimodal.dHash64(Multimodal.encodeGrayPng(Array.fill[Byte](64)(42), 8, 8)).get shouldBe 0L
    // exactly one rising edge at row 0, col 2 -> bit 2 only
    val one = Array.fill[Byte](64)(7)
    one(3) = 9 // px(r=0, c=3) > px(r=0, c=2); c=3 itself then FALLS to 7
    val h = Multimodal.dHash64(Multimodal.encodeGrayPng(one, 8, 8)).get
    h shouldBe (1L << 2)
    // garbage payloads hash to None, not an exception
    Multimodal.dHash64("not an image".getBytes) shouldBe None
    Multimodal.dHash64(null) shouldBe None
  }

  test("RGB PNG decodes 3 channels with per-channel means") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // r g / b r: distinct per-channel means
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = Multimodal.imageStats(bos.toByteArray).get
    s.channels shouldBe 3
    s.channelMean.map(m => math.round(m * 100) / 100.0) shouldBe
      Array(127.5, 63.75, 63.75) // 2x255/4, 255/4, 255/4
  }

  test("ImageIoDecoder features lay out [w, h, c, means, stds] padded to dim") {
    val png = Multimodal.encodeGrayPng(Array.fill[Byte](64)(100), 8, 8)
    val f = Multimodal.ImageIoDecoder.features(png, 8)
    f.length shouldBe 8
    f.take(5) shouldBe Array(8.0f, 8.0f, 1.0f, 100.0f, 0.0f) // constant image: std 0
    f.drop(5) shouldBe Array(0.0f, 0.0f, 0.0f) // zero padding
  }

  test("non-image payloads decode to None / null features, not an exception") {
    Multimodal.imageStats("not an image".getBytes) shouldBe None
    Multimodal.imageStats(Array.emptyByteArray) shouldBe None
    Multimodal.ImageIoDecoder.features("junk".getBytes, 4) shouldBe null
  }

  test("encode + decodeImageMeta round-trips through DataFrames") {
    val base = media.select(col("id"), col("media"))
    val png = Multimodal.encodeGrayPngCol(base, "media", w = 2, h = 4)
    val out = Multimodal.decodeImageMeta(png, "png").orderBy("id").collect()
    out.foreach { r =>
      r.getAs[String]("img_format") shouldBe "png"
      r.getAs[Int]("width") shouldBe 2
      r.getAs[Int]("height") shouldBe 4
      r.getAs[Int]("channels") shouldBe 1
    }
    // id 1 payload "abcdefgh": mean of byte values a..h
    val exp = "abcdefgh".getBytes.map(_.toDouble).sum / 8.0
    out(0).getAs[Seq[Double]]("chan_mean").head shouldBe exp +- 1e-9
  }

  test("audioEnergy: per-frame RMS matches hand computation, tail frame included") {
    import org.apache.spark.sql.functions.{col, posexplode}
    val df = Seq((1L, "abcde"), (2L, "")).toDF("id", "payload")
    val out = df.select(col("id"),
      posexplode(Multimodal.audioEnergy(col("payload"), frameSize = 2))
        .as(Seq("f", "rms")))
      .orderBy("id", "f").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def rms(s: String): Double = {
      val ss = s.getBytes.map(b => b.toLong * b).sum
      BigDecimal(math.sqrt(ss.toDouble / s.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // frames: "ab", "cd", tail "e"; empty payload -> no frames
    out.toSeq shouldBe Seq(
      (1L, 0, rms("ab")), (1L, 1, rms("cd")), (1L, 2, rms("e")))
  }

  test("native audioEnergy is bit-identical to the lambda formulation twin") {
    import org.apache.spark.sql.functions.{array_join, col, transform => tfm}
    val payloads = Seq(
      (1L, "hello world this is a longer payload with many frames of text"),
      (2L, "x"),
      (3L, "ab"),
      (4L, ""),
      (5L, "héllo€BMP unicode payload"), // 2- and 3-byte chars
      (6L, (0 until 300).map(i => ('a' + i % 26).toChar).mkString))
      .toDF("id", "payload")
    def ser(c: org.apache.spark.sql.Column) =
      array_join(tfm(c, x => x.cast("string")), " ")
    val native = payloads.select(col("id"),
      ser(Multimodal.audioEnergy(col("payload"), 7)).as("e"))
    val lambda = payloads.select(col("id"),
      ser(Multimodal.audioEnergyLambda(col("payload"), 7)).as("e"))
    native.exceptAll(lambda).count() shouldBe 0L
    lambda.exceptAll(native).count() shouldBe 0L
  }

  test("audioEnergy plans map-only (no exchange)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "hello world payload")).toDF("id", "payload")
    val plan = df.select(Multimodal.audioEnergy(col("payload"), 4).as("e"))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    flattenPlan(plan).collect { case e: ShuffleExchangeLike => e } shouldBe empty
  }
}
