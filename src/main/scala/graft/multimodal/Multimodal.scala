package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2 row 56):
  * media travels as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition over batches
  * of rows so a real decoder amortizes model/codec setup once per
  * partition (the Scala analog of mapInPandas batching).
  *
  * The DECODE step is STUBBED: this environment has no image/audio
  * libraries, so [[RealDecoder]] is an unimplemented hook (???) and
  * [[FakeDecoder]] produces deterministic md5-seeded pseudo-features
  * with the exact schema/batch shape the real one would have. The
  * Spark-side plumbing — schema, partition batching, frame sampling,
  * metadata transforms — is real and spec-tested.
  */
object Multimodal {

  /** Canonical media metadata struct. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  trait Decoder extends Serializable {
    /** Fixed-dim feature vector for one media payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Hook for a real codec (javax.imageio / ffmpeg / librosa-alike).
    * Unimplemented here by design — no media libraries in this
    * environment.
    */
  object RealDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = ???
  }

  /** Deterministic stand-in: md5-chained pseudo-features in [-1, 1]. */
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

  /** Metadata-only "resize": records the new dimensions. A real
    * implementation would re-encode pixels in [[Decoder]]; the payload
    * passthrough documents that this is plumbing, not codec work.
    */
  def resizeMeta(df: DataFrame, metaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(metaCol,
      struct(
        col(s"$metaCol.format").as("format"),
        lit(w).as("width"),
        lit(h).as("height")))
}
