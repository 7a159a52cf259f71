package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2 row 56):
  * media travels as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition over batches
  * of rows so codec setup amortizes once per partition (the Scala
  * analog of mapInPandas batching).
  *
  * The image decode path is REAL: [[ImageIoDecoder]] reads any format
  * the pure-JDK `javax.imageio` registry supports (PNG, JPEG, GIF,
  * BMP) and extracts dimensions, channel count and per-channel
  * mean/std directly from the raster. [[FakeDecoder]] remains as the
  * deterministic stand-in for codecs the JDK lacks (audio/video).
  */
object Multimodal {

  /** Canonical media metadata struct. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  // ImageIO's default stream cache is DISK-backed: without this, every
  // per-row encode/decode creates and deletes a temp FILE. Memory-only
  // caching; referenced from each codec entry point so any executor
  // JVM flips it before its first image op.
  @transient private lazy val imageIoInit: Unit = ImageIO.setUseCache(false)

  trait Decoder extends Serializable {
    /** Fixed-dim feature vector for one media payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Decoded image summary: container format, dimensions, bands, and
    * per-band pixel mean/std (population).
    */
  final case class ImageStats(
      format: String, width: Int, height: Int, channels: Int,
      channelMean: Array[Double], channelStd: Array[Double])

  /** Decode an image payload with `javax.imageio`; None when no
    * installed reader recognizes the bytes (truncated/non-image
    * payloads decode to None, not an exception — a corpus-scale scan
    * must survive dirty rows).
    */
  def imageStats(bytes: Array[Byte]): Option[ImageStats] = {
    if (bytes == null || bytes.isEmpty) return None
    imageIoInit
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val img = reader.read(0)
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val sum = new Array[Double](bands)
        val sumSq = new Array[Double](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              val v = raster.getSampleDouble(x, y, b)
              sum(b) += v
              sumSq(b) += v * v
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val mean = sum.map(_ / n)
        val std = (0 until bands).map { b =>
          math.sqrt(math.max(0.0, sumSq(b) / n - mean(b) * mean(b)))
        }.toArray
        Some(ImageStats(reader.getFormatName.toLowerCase, w, h, bands, mean, std))
      } catch {
        // ImageIO plugins throw RuntimeExceptions (IllegalArgument,
        // ArrayIndexOutOfBounds) on malformed-but-recognized payloads,
        // not just IOException — one dirty row must not kill the scan
        case scala.util.control.NonFatal(_) => None
      } finally reader.dispose()
    } finally if (iis != null) iis.close()
  }

  /** Real pure-JDK image decoder: features are
    * `[width, height, channels, mean_0..mean_{c-1}, std_0..std_{c-1}]`
    * zero-padded/truncated to `dim`; unreadable payloads yield null.
    */
  object ImageIoDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      imageStats(bytes) match {
        case None => null
        case Some(s) =>
          val raw = Array(s.width.toDouble, s.height.toDouble, s.channels.toDouble) ++
            s.channelMean ++ s.channelStd
          Array.tabulate(dim)(i => if (i < raw.length) raw(i).toFloat else 0.0f)
      }
  }

  /** Deterministic stand-in for codecs the JDK lacks (audio/video):
    * md5-chained pseudo-features in [-1, 1].
    */
  object FakeDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Float](dim)
      var seed = md.digest(bytes)
      var i = 0
      while (i < dim) {
        if (i % 16 == 0 && i > 0) seed = md.digest(seed)
        val b = seed(i % 16)
        out(i) = b / 128.0f
        i += 1
      }
      out
    }
  }

  /** Encode a payload's first `w*h` bytes (zero-padded) as an 8-bit
    * grayscale PNG. Pixels are written straight into the raster's
    * backing buffer (row-major), so a later [[imageStats]] recovers
    * the exact byte values — PNG is lossless.
    */
  def encodeGrayPng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    imageIoInit
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val buf = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    val n = math.min(buf.length, if (bytes == null) 0 else bytes.length)
    if (n > 0) System.arraycopy(bytes, 0, buf, 0, n) // arraycopy(null,…) NPEs even at length 0
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-partition PNG encoding of a binary column into `outCol` —
    * the write half of the image pipeline (testdata has no media
    * files; real corpora would carry the encoded bytes already).
    */
  def encodeGrayPngCol(df: DataFrame, binCol: String, w: Int, h: Int,
                       outCol: String = "png"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val png = if (bytes == null) null else encodeGrayPng(bytes, w, h)
        Row.fromSeq(r.toSeq :+ png)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-partition image decode appending `img_format` (string),
    * `width`/`height`/`channels` (int) and `chan_mean`/`chan_std`
    * (array<double>); unreadable payloads decode to nulls. Constant
    * memory, reader lookup amortized by the JDK's registry.
    */
  def decodeImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("img_format", StringType))
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("channels", IntegerType))
      .add(StructField("chan_mean", ArrayType(DoubleType)))
      .add(StructField("chan_std", ArrayType(DoubleType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] = imageStats(r.getAs[Array[Byte]](binIdx)) match {
          case Some(s) =>
            Seq(s.format, s.width, s.height, s.channels,
              s.channelMean.toSeq, s.channelStd.toSeq)
          case None => Seq(null, null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  /** 64-bit-capped difference hash (dHash) of a decoded image — the
    * PERCEPTUAL near-dup key for image corpora (identical bytes is
    * the wrong dedup notion for media: re-encodes and metadata edits
    * change every byte but not the gradient structure). Bit
    * k = r·(w−1)+c is set iff gray(r,c) < gray(r,c+1) — horizontal
    * gradient signs, row-major; multi-channel images reduce to
    * integer-floor mean gray first. (w−1)·h ≤ 63 bits required (an
    * 8×8 thumbnail ⇒ 56 bits); production pipelines resize to the
    * thumbnail BEFORE hashing with the same decode machinery.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    imageIoInit
    if (bytes == null) return None
    try {
      // InputStream overload: ImageIO closes the wrapped stream itself
      // (a ByteArrayInputStream close is a no-op), so no double-close
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w < 2 || (w - 1).toLong * h > 63L) return None
      val raster = img.getRaster
      val bands = raster.getNumBands
      def gray(x: Int, y: Int): Int = {
        var s = 0
        var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        s / bands
      }
      var hash = 0L
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w - 1) {
          if (gray(c, r) < gray(c + 1, r))
            hash |= 1L << (r * (w - 1) + c)
          c += 1
        }
        r += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** Per-partition dHash column: appends `dhash` (long, null when the
    * payload doesn't decode). Map-only, constant memory.
    */
  def dHashCol(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("dhash", LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ dHash64(r.getAs[Array[Byte]](binIdx)).orNull)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-partition batched feature extraction: appends `features`
    * (array<float>) computed by `decoder` from `binCol`. Row batches
    * stream through the iterator — constant memory, decoder setup cost
    * amortized per partition (not per row).
    */
  def decodeFeatures(
      df: DataFrame,
      binCol: String,
      dim: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feats = if (bytes == null) null else decoder.features(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Sample every `everyN`-th fixed-size frame from a binary payload
    * (video/audio chunking) — pure Catalyst expression, no UDF.
    */
  def frameSample(bin: org.apache.spark.sql.Column, frameSize: Int, everyN: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(bin).cast("double") / frameSize).cast("int")
    // empty payload => no frames (sequence(0, greatest(-1,0)) would
    // otherwise emit one empty frame)
    when(length(bin) === 0, array().cast("array<binary>")).otherwise(
      filter(
        transform(sequence(lit(0), nFrames - 1),
          i => substring(bin, (i * frameSize + 1).cast("int"), lit(frameSize))),
        (_, i) => i % everyN === 0))
  }

  /** Per-frame RMS energy over an 8-bit-sample payload (the audio
    * analog of [[frameSample]] — energy/VAD-style gating without a
    * codec): payload chars are the samples (the container has no audio
    * libs, so the "decode" is the deterministic identity over
    * normalized-ASCII bytes; the Spark-side plumbing — framing, exact
    * integer sum-of-squares, one map-only expression per row — is the
    * real part). Frame f covers samples [f·frameSize, min((f+1)·
    * frameSize, n)); rms = sqrt(Σ s², integer-exact in any engine,
    * divided once) rounded to 4dp.
    */
  def audioEnergy(payload: org.apache.spark.sql.Column, frameSize: Int): org.apache.spark.sql.Column =
    call_function("graft_audio_rms", payload, lit(frameSize))

  /** The `transform`/`aggregate` formulation twin of [[audioEnergy]]
    * (the shape the DuckDB oracle mirrors; the native kernel is
    * spec-asserted bit-identical on BMP payloads). Per sample it
    * evaluates an interpreted substr+ascii tree — quadratic per frame
    * on UTF8String — so the hot path uses the one-pass kernel.
    */
  private[graft] def audioEnergyLambda(payload: org.apache.spark.sql.Column, frameSize: Int): org.apache.spark.sql.Column = {
    val len = length(payload)
    val nFrames = ceil(len.cast("double") / frameSize).cast("int")
    when(len === 0, array().cast("array<double>")).otherwise(
      transform(sequence(lit(0), nFrames - 1), f => {
        val start = f * frameSize + 1
        val end = least(((f + 1) * frameSize), len)
        val n = (end - start + 1).cast("double")
        val sumSq = aggregate(sequence(start, end), lit(0L), (acc, i) => {
          val v = ascii(payload.substr(i, lit(1))).cast("long")
          acc + v * v
        })
        round(sqrt(sumSq.cast("double") / n), 4)
      }))
  }

  /** Metadata-only "resize": records the new dimensions. A pixel
    * resize would re-encode through [[encodeGrayPng]]-style raster
    * work; the passthrough keeps the metadata surface separate from
    * codec work.
    */
  def resizeMeta(df: DataFrame, metaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(metaCol,
      struct(
        col(s"$metaCol.format").as("format"),
        lit(w).as("width"),
        lit(h).as("height")))
}
