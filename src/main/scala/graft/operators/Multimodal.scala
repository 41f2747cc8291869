package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata structs,
  * with decode / feature-extraction / resize / frame-sampling implemented
  * as *batched per-partition* operators (the Scala analogue of Pandas UDFs
  * over `mapInPandas` — one vectorized call per batch, not per row).
  *
  * All four verbs are REAL pure-JDK implementations: image decode
  * ([[Multimodal.ImageIoCodec]], javax.imageio), audio decode
  * ([[Multimodal.AudioWavCodec]], javax.sound.sampled), video frame
  * extraction ([[Multimodal.GifVideoCodec]], animated GIF through
  * javax.imageio), and pixel-exact resize ([[Multimodal.resizeImages]]).
  * `StubCodec` remains the deterministic fallback for undecodable blobs
  * and the stand-in for heavy-model feature extraction; a production
  * build swaps `MediaCodec` for a heavier JNI/FFI implementation with no
  * pipeline changes.
  */
object Multimodal {

  /** media table schema: (media_id, kind, bytes, meta{width,height,format,duration_ms}) */
  final case class MediaMeta(width: Int, height: Int, format: String, duration_ms: Long)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  final case class FrameRow(media_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  /** Codec boundary — the only stubbed piece. */
  trait MediaCodec extends Serializable {
    /** decode + embed one batch of media blobs into feature vectors. */
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures]
    /** sample up to n frames from a video blob. */
    def sampleFrames(row: MediaRow, n: Int): Seq[FrameRow]
  }

  /** Deterministic stand-in: features derive from a rolling hash over the
    * bytes (STUB — a real codec decodes pixels/samples here). */
  final class StubCodec(dim: Int = 16) extends MediaCodec {
    override def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val h = TextKernels.mix(TextKernels.fnv1a64(r.bytes, 0, r.bytes.length), d.toLong)
        out(d) = ((h & 0xffff).toFloat / 0xffff) - 0.5f
        d += 1
      }
      MediaFeatures(r.media_id, r.kind, out)
    }
    override def sampleFrames(row: MediaRow, n: Int): Seq[FrameRow] = {
      // STUB frame sampling: slice the blob into n even segments
      val len = row.bytes.length
      (0 until math.min(n, math.max(1, len))).map { i =>
        val from = i * len / n
        val until = math.max(from + 1, (i + 1) * len / n)
        FrameRow(row.media_id, i, java.util.Arrays.copyOfRange(row.bytes, from, until))
      }
    }
  }

  /** REAL pure-JVM image decode (PNG/BMP/GIF through javax.imageio — part
    * of the JDK, no native libs) behind the same codec boundary the stub
    * implements: a production build swaps in heavier codecs the same way.
    * Image features are decoded-pixel statistics,
    * `[width, height, sumR, sumG, sumB]` (sums are exact in float32 for
    * images under ~2^24 total luminance, and exact integers for the test
    * sizes). Non-image kinds and undecodable blobs fall back to the
    * deterministic stub so mixed-kind tables keep flowing. */
  final class ImageIoCodec(fallback: MediaCodec = new StubCodec(16)) extends MediaCodec {
    override def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = {
      // preserve the batching contract for the fallback: non-image and
      // undecodable rows go through ONE fallback call per batch (a real
      // fallback codec amortizes model startup per batch), then results
      // reassemble in input order
      val decoded = rows.map { r =>
        val img =
          if (r.kind != "image") null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        r -> Option(img)
      }
      val fellBack = decoded.collect { case (r, None) => r }
      val fbByKey = fallback.decodeBatch(fellBack)
        .map(f => f.media_id -> f).toMap
      decoded.map {
        case (r, None) => fbByKey(r.media_id)
        case (r, Some(img)) => imageStats(r, img)
      }
    }

    private def imageStats(
        r: MediaRow, img: java.awt.image.BufferedImage): MediaFeatures = {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.media_id, r.kind,
        Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat))
    }
    override def sampleFrames(row: MediaRow, n: Int): Seq[FrameRow] =
      fallback.sampleFrames(row, n)
  }

  /** REAL pure-JVM audio decode (WAV/PCM through javax.sound.sampled —
    * the JDK's own RIFF/WAVE codec, no native libs) behind the same codec
    * boundary. Audio features are decoded-sample statistics,
    * `[n_samples, sample_rate, mean, rms, zero_crossings]`: the integer
    * stats are exact, and mean/rms are one double division (+ sqrt) of
    * exact BIGINT sums — IEEE-identical across JVM and SQL, so a DuckDB
    * oracle can replay them float-for-float. Non-audio kinds and
    * undecodable blobs batch through the fallback like [[ImageIoCodec]]. */
  final class AudioWavCodec(fallback: MediaCodec = new StubCodec(16)) extends MediaCodec {
    override def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = {
      val decoded = rows.map { r =>
        val pcm =
          if (r.kind != "audio") None
          else scala.util.Try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.bytes))
            val fmt = ais.getFormat
            require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
            (ais.readAllBytes(), fmt.getSampleRate, fmt.isBigEndian)
          }.toOption
        r -> pcm
      }
      val fbByKey = fallback.decodeBatch(decoded.collect { case (r, None) => r })
        .map(f => f.media_id -> f).toMap
      decoded.map {
        case (r, None) => fbByKey(r.media_id)
        case (r, Some((bytes, rate, bigEndian))) => audioStats(r, bytes, rate, bigEndian)
      }
    }

    private def audioStats(
        r: MediaRow, bytes: Array[Byte], rate: Float, bigEndian: Boolean): MediaFeatures = {
      val n = bytes.length / 2
      var sum = 0L; var sumSq = 0L; var zcr = 0L
      var prevNonNeg = true
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
        sum += s; sumSq += s.toLong * s
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) zcr += 1
        prevNonNeg = nonNeg
        i += 1
      }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
      MediaFeatures(r.media_id, r.kind,
        Array(n.toFloat, rate, mean.toFloat, rms.toFloat, zcr.toFloat))
    }
    override def sampleFrames(row: MediaRow, n: Int): Seq[FrameRow] =
      fallback.sampleFrames(row, n)
  }

  /** Deterministic REAL WAV table: sample i of clip `id` is the signed
    * 16-bit value `(mix(id, i) & 0xffff) − 32768`, wrapped in a canonical
    * 44-byte RIFF/WAVE PCM16LE mono container (hand-assembled, so the
    * synthesis side shares no code with the decoding JDK codec). The
    * recurrence is SQL-replayable, so a DuckDB oracle recomputes the
    * sample statistics without any audio library — hash-gating the
    * container parse + PCM decode end-to-end. */
  def syntheticWavMedia(
      ids: Dataset[java.lang.Long],
      nSamples: Int = 256,
      sampleRate: Int = 16000): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.map { idBoxed =>
      val id = idBoxed.longValue()
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        bb.putShort((((TextKernels.mix(id, i.toLong) & 0xffffL) - 32768L)).toShort)
        i += 1
      }
      MediaRow(id, "audio", bb.array(),
        MediaMeta(0, 0, "wav", nSamples * 1000L / sampleRate))
    }
  }

  /** REAL pure-JVM video frame extraction: animated GIF through
    * javax.imageio — the JDK's GIF plugin reads multi-frame containers
    * frame-by-frame, which makes GIF the one video-ish format this
    * sandbox can decode for real. `sampleFrames` returns n evenly-spaced
    * REAL frames re-encoded as standalone PNGs (lossless, so downstream
    * image ops — [[ImageIoCodec]], resize — consume them unchanged);
    * `decodeBatch` and non-GIF kinds batch through the fallback. */
  final class GifVideoCodec(fallback: MediaCodec = new StubCodec(16)) extends MediaCodec {
    override def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] =
      fallback.decodeBatch(rows)

    override def sampleFrames(row: MediaRow, n: Int): Seq[FrameRow] = {
      val frames = scala.util.Try {
        // close the input stream too: with the default disk cache it holds
        // an open temp file per call, which a long-lived executor leaks
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.bytes))
        try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext)
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val total = reader.getNumImages(true)
          require(total > 0)
          // n evenly-spaced frames (all of them when n >= total), each a
          // full image (the synthetic writer emits full-replacement
          // frames; partial-disposal GIFs would need compositing here)
          val picks =
            if (n >= total) 0 until total
            else (0 until n).map(i => i * total / n)
          picks.zipWithIndex.map { case (f, i) =>
            val img = reader.read(f)
            // explicit palette→RGB copy before the PNG encode: the JDK
            // PNG writer quantizes when handed the GIF reader's indexed
            // image directly (observed 240→248), while TYPE_INT_RGB
            // round-trips losslessly
            val rgb = new java.awt.image.BufferedImage(
              img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                rgb.setRGB(x, y, img.getRGB(x, y)); x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(rgb, "png", baos)
            FrameRow(row.media_id, i, baos.toByteArray)
          }
        } finally reader.dispose()
        } finally iis.close()
      }.toOption
      frames.getOrElse(fallback.sampleFrames(row, n))
    }
  }

  /** Deterministic REAL animated-GIF table: frame f's pixel (x, y) of clip
    * `id` is the 8-bit gray value `mix(id, (f·h + y)·w + x) & 0xff`,
    * written as an INDEXED image over an explicit 256-gray palette — GIF
    * stores palette indices losslessly (no quantization to invite), so
    * the recurrence is SQL-replayable and a DuckDB oracle can recompute
    * per-frame pixel statistics without any codec, hash-gating the
    * animated-container parse + frame decode end-to-end. */
  def syntheticGifMedia(
      ids: Dataset[java.lang.Long],
      frames: Int = 6, w: Int = 8, h: Int = 8): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.map { idBoxed =>
      val id = idBoxed.longValue()
      val grays = Array.tabulate(256)(i => (i | (i << 8) | (i << 16) | 0xff000000).toInt)
      val icm = new java.awt.image.IndexColorModel(
        8, 256, grays, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
      val baos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(
          writer.getDefaultStreamMetadata(writer.getDefaultWriteParam))
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                (TextKernels.mix(id, ((f * h + y) * w + x).toLong) & 0xff).toInt)
              x += 1
            }
            y += 1
          }
          // image metadata derived from the indexed type: the frame's
          // local color table is then the explicit 256-gray palette, not
          // a writer-chosen quantization
          val meta = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, meta), writer.getDefaultWriteParam)
          f += 1
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      MediaRow(id, "video", baos.toByteArray, MediaMeta(w, h, "gif", frames * 100L))
    }
  }

  /** Deterministic REAL PNG table: pixel (x, y) channel c of image `id` is
    * `mix(id, (c·h + y)·w + x) & 0xff` (TextKernels.mix — splitmix64
    * finalizer), encoded through the JDK's lossless PNG writer. Because the
    * recurrence is SQL-replayable, a DuckDB oracle can recompute the pixel
    * statistics WITHOUT any image library — which turns the
    * encode → decode → stats path into a hash-gated end-to-end test of the
    * real codec. */
  def syntheticPngMedia(ids: Dataset[java.lang.Long], w: Int = 8, h: Int = 8): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.map { idBoxed =>
      val id = idBoxed.longValue()
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def chan(c: Int): Int =
            (TextKernels.mix(id, ((c * h + y) * w + x).toLong) & 0xff).toInt
          img.setRGB(x, y, (chan(0) << 16) | (chan(1) << 8) | chan(2))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      MediaRow(id, "image", baos.toByteArray, MediaMeta(w, h, "png", 0L))
    }
  }

  /** Batched feature extraction: one codec call per `batchSize` rows per
    * partition (the mapInPandas batch shape). Output is a (media_id, kind,
    * features) frame ready to join with text/embedding tables.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: MediaCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => codec.decodeBatch(batch))
    }
  }

  /** Frame sampling for video rows → exploded (media_id, frame_index, bytes). */
  def sampleFrames(
      media: Dataset[MediaRow],
      codec: MediaCodec,
      framesPerVideo: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap(r => codec.sampleFrames(r, framesPerVideo))
  }

  /** REAL batched image resize: decode (javax.imageio) → nearest-neighbor
    * scale to the [[planResize]] box fit → lossless PNG re-encode, one
    * partition-local pass (the mapInPandas batch shape, like
    * [[extractFeatures]]). Nearest-neighbor is the deterministic choice:
    * destination pixel (x, y) samples source pixel (⌊x/s⌋, ⌊y/s⌋), which
    * is SQL-replayable — bilinear would drag in AWT filtering internals
    * no oracle could pin. Non-image kinds and undecodable blobs pass
    * through unchanged (metadata intact) so mixed tables keep flowing. */
  def resizeImages(
      media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val resized = scala.util.Try {
        require(r.kind == "image")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        require(img != null)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
        require(scale < 1.0) // already inside the box: passthrough
        val dw = math.max(1, math.floor(img.getWidth * scale).toInt)
        val dh = math.max(1, math.floor(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < dh) {
          var x = 0
          while (x < dw) {
            // explicit floor sampling, not AffineTransformOp: the AWT
            // op's half-pixel phase is an implementation detail; this
            // mapping is the contract (and the mm5 oracle's replay)
            out.setRGB(x, y, img.getRGB(
              math.min(img.getWidth - 1, (x / scale).toInt),
              math.min(img.getHeight - 1, (y / scale).toInt)))
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        MediaRow(r.media_id, r.kind, baos.toByteArray,
          MediaMeta(dw, dh, "png", r.meta.duration_ms))
      }
      resized.getOrElse(r)
    }
  }

  /** Metadata-level resize planning (pure column math — no decode needed):
    * target box fit preserving aspect ratio. Dimensions clamp to ≥1, the
    * same floor [[resizeImages]] applies, so plan and execution always
    * agree on extreme aspect ratios. */
  def planResize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("meta.width").cast("double"),
      lit(maxH) / col("meta.height").cast("double"), lit(1.0))
    media.select(col("media_id"),
      col("meta.width").as("src_w"), col("meta.height").as("src_h"),
      greatest(lit(1), floor(col("meta.width") * scale).cast("int")).as("dst_w"),
      greatest(lit(1), floor(col("meta.height") * scale).cast("int")).as("dst_h"))
  }

  /** Deterministic synthetic media table (for tests/bench: binary payloads
    * derived from doc text bytes). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val kind = id % 3 match { case 0 => "image" case 1 => "audio" case _ => "video" }
      MediaRow(id, kind, bytes,
        MediaMeta(64 + (id % 16).toInt * 8, 64 + (id % 9).toInt * 8,
          if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
          if (kind == "video") 1000L + id % 5000 else 0L))
    }
  }
}
