package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, and partition-wise decode/feature-extract
  * operators.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batch-per-partition processing — while the actual codec call is a
  * STUB (`fakeDecode`): this container ships no image/audio libraries,
  * so the decoder is a deterministic byte-level fake with the same
  * signature a libjpeg/ffmpeg-backed implementation would have. Swap
  * `fakeDecode` for the real codec and nothing else changes.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a binary payload column with extracted metadata. Header
    * sniffing is real (magic bytes); width/height come from the stub
    * decode. */
  def withMediaMeta(df: DataFrame, bin: String): DataFrame = {
    val fmt = when(substring(col(bin), 1, 3) === lit("ÿØÿ".getBytes("ISO-8859-1")), "jpeg")
      .when(substring(col(bin), 1, 4) === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
      .otherwise("unknown")
    df.withColumn("media_meta", struct(
      fmt.as("format"),
      lit(null).cast(IntegerType).as("width"),   // filled by decode
      lit(null).cast(IntegerType).as("height"),
      length(col(bin)).cast(LongType).as("n_bytes")))
  }

  /** STUB decoder — deterministic fake standing in for the real codec.
    * Real impl: hand `bytes` to the image/audio library and return its
    * pixel/PCM buffer. Here: a fixed-size "image" whose pixels are a
    * byte histogram of the payload (deterministic, content-sensitive). */
  def fakeDecode(bytes: Array[Byte], targetDim: Int): Array[Float] = {
    val hist = new Array[Float](targetDim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) % targetDim) += 1f; i += 1 }
      val n = math.max(bytes.length, 1)
      var j = 0
      while (j < targetDim) { hist(j) /= n.toFloat; j += 1 }
    }
    hist
  }

  /** Partition-wise decode + feature extraction: the real batch shape —
    * one decoder context per partition (codecs are expensive to init),
    * rows streamed through it. Output schema: input columns +
    * `features array<float>`. */
  def extractFeatures(df: DataFrame, bin: String, dim: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(bin)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec context reuse)
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ fakeDecode(bytes, dim).toSeq)
      }
    }
  }

  /** Frame sampling stub for video-like payloads: split the payload
    * into `frames` equal chunks ("frames"), keep every `stride`-th —
    * the real version replaces chunking with container demux. Output:
    * (id row ..., frame_idx, frame binary). */
  def sampleFrames(df: DataFrame, bin: String, frames: Int, stride: Int): DataFrame = {
    val chunk = (length(col(bin)) / frames).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(frames - 1), lit(stride))))
      .withColumn("frame",
        expr(s"substring($bin, frame_idx * (length($bin) div $frames) + 1, " +
          s"greatest(length($bin) div $frames, 1))"))
      .drop(bin)
  }

  /** Treat a text column as an opaque payload (for pipelines whose
    * fixtures have no true binary column). */
  def asBinary(df: DataFrame, text: String, out: String): DataFrame =
    df.withColumn(out, col(text).cast("binary"))
}
