package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, and partition-wise decode/feature-extract
  * operators.
  *
  * Image payloads decode for real through `javax.imageio` (pure JVM —
  * PNG/JPEG/GIF/BMP, no native libraries needed): pixel dimensions land
  * in `media_meta` and features are a luminance histogram of the actual
  * pixels. Audio decodes through `javax.sound.sampled` (WAV/AIFF/AU):
  * headers into `audio_meta` and PCM sample streams into a real RMS
  * energy envelope; multi-frame containers demux for real — animated GIF
  * via ImageIO, RIFF/AVI MJPEG via [[demuxAviFrames]] (MJPEG frames are
  * JPEGs, so the whole container parses pure-JVM). Only payloads none
  * of those claim — inter-frame video codecs like h264/vp9, which are
  * not pure-JVM — fall back to `fakeDecode`/byte chunking, deterministic
  * stand-ins with the same signature an ffmpeg-backed codec would have;
  * swap them out and nothing else changes.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a binary payload column with extracted metadata. Header
    * sniffing is a pure-column expression (magic bytes); width/height
    * stay null here — [[withDecodedMeta]] fills them via the real
    * decoder when the payload is an image. */
  def withMediaMeta(df: DataFrame, bin: String): DataFrame = {
    val fmt = when(substring(col(bin), 1, 3) === lit("ÿØÿ".getBytes("ISO-8859-1")), "jpeg")
      .when(substring(col(bin), 1, 4) === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
      .otherwise("unknown")
    df.withColumn("media_meta", struct(
      fmt.as("format"),
      lit(null).cast(IntegerType).as("width"),   // filled by withDecodedMeta
      lit(null).cast(IntegerType).as("height"),
      length(col(bin)).cast(LongType).as("n_bytes")))
  }

  /** Real pixel dimensions via javax.imageio, or None when the payload
    * is not a decodable image. */
  def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(img => (img.getWidth, img.getHeight))
    } catch { case _: Exception => None }

  /** [[withMediaMeta]] plus a real decode pass: partition-wise ImageIO
    * read filling width/height (nulls for non-images). Decode cost is
    * per-row and embarrassingly parallel — the scan-speed shape. */
  def withDecodedMeta(df: DataFrame, bin: String): DataFrame = {
    val base = withMediaMeta(df, bin)
    val outSchema = base.schema
    val binIdx = base.schema.fieldIndex(bin)
    val metaIdx = base.schema.fieldIndex("media_meta")
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val dims = decodeDims(r.get(binIdx).asInstanceOf[Array[Byte]])
        val filled = Row(meta.get(0), dims.map(d => Int.box(d._1)).orNull,
          dims.map(d => Int.box(d._2)).orNull, meta.get(3))
        Row.fromSeq(r.toSeq.updated(metaIdx, filled))
      }
    }
  }

  /** Real image feature extraction: decode via javax.imageio and bin
    * the pixels' luminance (ITU-R BT.601 integer weights) into a
    * normalized `targetDim`-bucket histogram. None when not an image. */
  def imageDecode(bytes: Array[Byte], targetDim: Int): Option[Array[Float]] =
    if (bytes == null) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val hist = new Array[Float](targetDim)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(lum * targetDim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1)
        var j = 0
        while (j < targetDim) { hist(j) /= n.toFloat; j += 1 }
        hist
      }
    } catch { case _: Exception => None }

  /** 64-bit average-hash (aHash) perceptual image fingerprint: the
    * image is divided into an 8×8 block grid, each block's mean
    * luminance (BT.601 integer weights, same as [[imageDecode]]) is
    * compared to the global mean, and bit by·8+bx is set iff the block
    * is brighter. Every comparison is an exact integer cross-multiply
    * (blockSum·totalN > totalSum·blockN) — no float resize, no AWT
    * interpolation — so the hash is deterministic across JVMs. None
    * when the payload is not ImageIO-decodable. Near-identical images
    * (recompression, slight brightness/noise) differ in a few bits;
    * unrelated images differ in ~32. */
  def imageAHash(bytes: Array[Byte]): Option[Long] =
    if (bytes == null) None
    else try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var totalSum = 0L
        var y = 0
        while (y < h) {
          val by = math.min(y * 8 / h, 7)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            val b = by * 8 + math.min(x * 8 / w, 7)
            sums(b) += lum; counts(b) += 1; totalSum += lum
            x += 1
          }
          y += 1
        }
        val totalN = w.toLong * h
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (sums(b) * totalN > totalSum * counts(b)) hash |= 1L << b
          b += 1
        }
        hash
      }
    } catch { case _: Exception => None }

  /** Image near-duplicate pairs over a binary column: aHash per
    * decodable payload (partition-wise decode; non-images drop out),
    * then the SAME pigeonhole bit-band join + exact Hamming filter the
    * text SimHash path uses ([[Dedup.simhashPairs]]) — one equi-join
    * on (band, key), never an all-pairs comparison. This is how an
    * image corpus dedups at fleet scale: a 64-bit sketch per image,
    * banded; candidates are hash-bucket collisions only. Output:
    * (a, b, hamming), a < b. */
  def imageNearDupPairs(df: DataFrame, bin: String, id: String,
                        maxHamming: Int = 7, bands: Int = 8): DataFrame = {
    val binIdx = df.schema.fieldIndex(bin)
    val idIdx = df.schema.fieldIndex(id)
    val outSchema = StructType(Seq(df.schema(idIdx),
      org.apache.spark.sql.types.StructField("simhash",
        org.apache.spark.sql.types.LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val hashes = df.mapPartitions { rows =>
      rows.flatMap { r =>
        imageAHash(r.get(binIdx).asInstanceOf[Array[Byte]])
          .map(hsh => Row(r.get(idIdx), Long.box(hsh)))
      }
    }
    Dedup.simhashPairs(hashes, id, maxHamming, bands)
  }

  /** Real PCM audio feature extraction via javax.sound.sampled (pure
    * JVM — WAV/AIFF/AU): decode the sample stream (16-bit signed PCM,
    * either endianness, channels averaged), split it into `targetDim`
    * equal windows, and emit the per-window RMS energy envelope
    * normalized by the loudest window — the standard cheap audio
    * fingerprint (silence/speech/music segmentation, duplicate-audio
    * candidates). None when the payload is not a PCM audio stream. */
  def audioDecode(bytes: Array[Byte], targetDim: Int): Option[Array[Float]] =
    if (bytes == null) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          val nSamples = data.length / (2 * ch)
          if (nSamples < targetDim) None
          else {
            // mono mixdown sample s = mean over channels
            val mono = new Array[Double](nSamples)
            var s = 0
            while (s < nSamples) {
              var c = 0
              var acc = 0.0
              while (c < ch) {
                val o = (s * ch + c) * 2
                val v =
                  if (big) ((data(o) << 8) | (data(o + 1) & 0xFF)).toShort
                  else ((data(o + 1) << 8) | (data(o) & 0xFF)).toShort
                acc += v
                c += 1
              }
              mono(s) = acc / ch
              s += 1
            }
            val env = new Array[Float](targetDim)
            var w = 0
            while (w < targetDim) {
              val from = (w.toLong * nSamples / targetDim).toInt
              val until = ((w + 1).toLong * nSamples / targetDim).toInt
              var acc = 0.0
              var i = from
              while (i < until) { acc += mono(i) * mono(i); i += 1 }
              env(w) = math.sqrt(acc / math.max(until - from, 1)).toFloat
              w += 1
            }
            val mx = env.max
            if (mx > 0f) { var j = 0; while (j < targetDim) { env(j) /= mx; j += 1 } }
            Some(env)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Fallback decoder for payloads no real decoder claims —
    * deterministic byte-histogram stand-in with the codec signature
    * (compressed audio and inter-frame video codecs are not pure-JVM;
    * swap this out, nothing else changes). */
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

  /** Partition-wise decode + feature extraction: one decoder context
    * per partition (codecs are expensive to init), rows streamed
    * through it. Images get real pixel-luminance features
    * ([[imageDecode]]), PCM audio the real RMS energy envelope
    * ([[audioDecode]]); everything else the byte-histogram fallback.
    * Output schema: input columns + `features array<float>`. */
  def extractFeatures(df: DataFrame, bin: String, dim: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(bin)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec context reuse)
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        val feats = imageDecode(bytes, dim)
          .orElse(audioDecode(bytes, dim))
          .getOrElse(fakeDecode(bytes, dim))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", FloatType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("n_bytes", LongType)))

  /** Real audio header decode via javax.sound.sampled (pure JVM —
    * WAV/AIFF/AU): sample rate, channel count, frame length. None for
    * non-audio payloads. */
  def decodeAudioMeta(bytes: Array[Byte]): Option[(Float, Int, Long)] =
    if (bytes == null) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        Some((f.getSampleRate, f.getChannels, ais.getFrameLength))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Partition-wise audio metadata: input columns + `audio_meta`
    * (null struct fields for non-audio payloads). Same batch shape as
    * the image path. */
  def withAudioMeta(df: DataFrame, bin: String): DataFrame = {
    val outSchema = df.schema.add(StructField("audio_meta", audioMetaSchema))
    val binIdx = df.schema.fieldIndex(bin)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        val meta = decodeAudioMeta(bytes) match {
          case Some((sr, ch, fr)) =>
            Row(sr, ch, fr, if (bytes == null) 0L else bytes.length.toLong)
          case None => Row(null, null, null,
            if (bytes == null) 0L else bytes.length.toLong)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Real image resize: decode via javax.imageio, bilinear-rescale to
    * (w, h), re-encode as PNG. Non-image payloads pass through
    * unchanged (nulls stay null) — the pipeline shape is
    * filter-on-format upstream, not crash-on-bytes here. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    if (bytes == null) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
    } catch { case _: Exception => None }

  /** Partition-wise resize over a binary image column: decodable rows
    * are replaced by the (w, h) PNG re-encode, the rest pass through.
    * Same batch shape as [[extractFeatures]]. */
  def resizeImages(df: DataFrame, bin: String, w: Int, h: Int): DataFrame = {
    val outSchema = df.schema
    val binIdx = df.schema.fieldIndex(bin)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        resizeImage(bytes, w, h) match {
          case Some(resized) => Row.fromSeq(r.toSeq.updated(binIdx, resized))
          case None => r
        }
      }
    }
  }

  /** Real multi-frame container demux via ImageIO (pure JVM — animated
    * GIF and any other multi-image format an installed reader
    * handles): stride-sampled frame indices below min(n, `frames`),
    * each frame decoded and re-encoded as PNG. None when no ImageIO
    * reader claims the payload. */
  def decodeFrames(bytes: Array[Byte], frames: Int,
                   stride: Int): Option[Seq[(Int, Array[Byte])]] =
    if (bytes == null) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else Some(
              Iterator.from(0, stride).takeWhile(_ < math.min(n, frames))
                .map { i =>
                  val baos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(reader.read(i), "png", baos)
                  (i, baos.toByteArray)
                }.toSeq)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Pure-JVM RIFF/AVI demux for MJPEG video streams: walk the RIFF
    * chunk tree, collect the video frame chunks (`##dc`/`##db`, inside
    * `movi` lists, including nested `rec ` groups), stride-sample, and
    * decode each frame — MJPEG frames ARE JPEGs, so `javax.imageio`
    * reads them with no native codec — re-encoding as PNG for the same
    * output contract as [[decodeFrames]]. Defensive on sizes (a chunk
    * running past the buffer stops the walk rather than throwing) and
    * on nesting (the chunk tree is walked with an explicit work stack,
    * so adversarially deep LIST nesting cannot StackOverflowError the
    * task — corrupt payloads degrade to the byte-chunk fallback);
    * None when the payload is not RIFF/AVI, has no video chunks, or
    * its codec is not ImageIO-decodable (true inter-frame codecs like
    * h264 — the one remaining declared fallback). */
  def demuxAviFrames(bytes: Array[Byte], frames: Int,
                     stride: Int): Option[Seq[(Int, Array[Byte])]] = {
    if (bytes == null || bytes.length < 12) return None
    def le32(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "ISO-8859-1")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val vids = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isVideoId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    // Iterative walk with an explicit work stack: nesting depth is
    // attacker-controlled (each LIST costs only 12 bytes), so recursion
    // would StackOverflowError — an Error, escaping the catch below and
    // killing the task instead of falling back. The stack holds
    // (cursor, end, inMovi) ranges still to scan; frame order is
    // preserved because a LIST's body is pushed along with the
    // remainder of the enclosing range and scanned first (LIFO).
    val work = scala.collection.mutable.Stack[(Int, Int, Boolean)](
      (12, bytes.length, false))
    while (work.nonEmpty) {
      val (start, end, inMovi) = work.pop()
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val id = fourcc(o)
        val sz = le32(o + 4)
        if (sz < 0 || sz > Int.MaxValue - 16 || o + 8 + sz > end) ok = false
        else {
          val szI = sz.toInt
          val next = o + 8 + szI + (szI & 1) // chunks pad to even offsets
          if (id == "LIST" && szI >= 4) {
            // Defer the rest of this range, then descend into the LIST
            // body first so video chunks are collected in file order.
            work.push((next, end, inMovi))
            work.push((o + 12, o + 8 + szI,
              inMovi || fourcc(o + 8) == "movi" || fourcc(o + 8) == "rec "))
            ok = false // this range continues via the pushed remainder
          } else {
            if (inMovi && isVideoId(id) && szI > 0) vids += ((o + 8, szI))
            o = next
          }
        }
      }
    }
    if (vids.isEmpty) return None
    try {
      val out = Seq.newBuilder[(Int, Array[Byte])]
      val it = Iterator.from(0, stride)
        .takeWhile(_ < math.min(vids.length, frames))
      while (it.hasNext) {
        val i = it.next()
        val (off, len) = vids(i)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(bytes, off, off + len)))
        if (img == null) return None // video chunks, but not an MJPEG-style codec
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        out += ((i, baos.toByteArray))
      }
      Some(out.result())
    } catch { case _: Exception => None }
  }

  /** Frame sampling over video-like payloads: multi-frame image
    * containers (animated GIF) demux for REAL through [[decodeFrames]],
    * and RIFF/AVI MJPEG video through [[demuxAviFrames]] — both pure
    * JVM; payloads neither claims — inter-frame video codecs (h264/vp9)
    * are not pure-JVM — fall back to stride-sampled equal byte chunks,
    * the declared stand-in with the same output shape an ffmpeg-backed
    * demuxer would fill. Output: (input columns minus `bin`,
    * frame_idx int, frame binary). */
  def sampleFrames(df: DataFrame, bin: String, frames: Int, stride: Int): DataFrame = {
    val binIdx = df.schema.fieldIndex(bin)
    val outSchema = StructType(df.schema.filterNot(_.name == bin))
      .add("frame_idx", IntegerType).add("frame", BinaryType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        val keep = r.toSeq.zipWithIndex.collect { case (v, i) if i != binIdx => v }
        decodeFrames(bytes, frames, stride)
          .orElse(demuxAviFrames(bytes, frames, stride)) match {
          case Some(fs) =>
            fs.map { case (i, b) => Row.fromSeq(keep :+ Int.box(i) :+ b) }
          case None =>
            val n = if (bytes == null) 0 else bytes.length
            val chunk = math.max(n / frames, 1)
            (0 until frames by stride).map { i =>
              val start = i * chunk
              val piece =
                if (bytes == null || start >= n) Array.empty[Byte]
                else java.util.Arrays.copyOfRange(bytes, start,
                  math.min(start + chunk, n))
              Row.fromSeq(keep :+ Int.box(i) :+ piece)
            }
        }
      }
    }
  }

  /** Treat a text column as an opaque payload (for pipelines whose
    * fixtures have no true binary column). */
  def asBinary(df: DataFrame, text: String, out: String): DataFrame =
    df.withColumn(out, col(text).cast("binary"))
}
