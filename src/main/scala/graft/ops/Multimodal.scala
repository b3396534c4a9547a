package graft.ops

import graft.core.XxHash64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video treated as opaque
  * `binary` columns + typed metadata structs, processed per-partition in
  * batches (the Scala analog of `mapInPandas`: one iterator of rows per
  * partition, batch-shaped work inside).
  *
  * All three kinds decode for REAL with zero non-JDK dependencies:
  * images are PNGs decoded via `javax.imageio` ([[ImageCodec]]); audio is
  * PCM-16 WAV decoded via `javax.sound.sampled` ([[WavCodec]]); video is
  * a GVID container — length-prefixed PNG frames, an intra-only MJPEG
  * analog — whose every frame decodes through the same ImageIO path
  * ([[VideoCodec]]). The Spark-side contract (schema, batch iteration,
  * partitioning) is identical for all three, so swapping GVID for an
  * inter-coded format (H.264 via JNI/javacv) changes no plan shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String,
                            payload: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 feat_hash: Long, n_frames: Int,
                                 mean_luma: Double)

  /** Real image codec over the JDK's ImageIO. PNG is lossless, so decoded
    * pixels — and therefore mean luma — are exact regardless of which
    * encoder produced the bytes. Luma is integer Rec.601
    * ((299R + 587G + 114B)/1000), accumulated in Long and divided once,
    * so the Double is a deterministic function of the pixels. */
  object ImageCodec {
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val h = XxHash64.hashLong(seed * 1000003L + y.toLong * width + x)
          img.setRGB(x, y, (h & 0xffffffL).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** (width, height, meanLuma∈[0,1]). Throws on undecodable bytes —
      * a corrupt-payload policy belongs to the caller (filter or
      * quarantine), not silent nulls. */
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sum += (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      (w, h, sum.toDouble / (w.toLong * h) / 255.0)
    }

    /** Real raster resize: decode (ImageIO), scale via Graphics2D
      * bilinear interpolation onto a fresh RGB raster, re-encode PNG.
      * Deterministic for a given JDK raster pipeline; exact dims are
      * the caller's contract, pixel values are the interpolator's. */
    def resize(payload: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      require(w2 > 0 && h2 > 0, s"bad resize target ${w2}x$h2")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      val out = new java.awt.image.BufferedImage(
        w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w2, h2, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Real audio codec over the JDK's `javax.sound.sampled` (ships in
    * every JRE — zero new dependencies). Payloads are RIFF/WAVE PCM-16
    * mono; the decoder goes through `AudioSystem.getAudioInputStream`
    * (real container parsing, not a header skip), then accumulates |s|
    * over the actual samples in a Long so the mean amplitude is a
    * deterministic function of the audio. */
  object WavCodec {
    val SampleRate = 8000

    /** Deterministic PCM-16 mono WAV: `nFrames` hash-derived samples. */
    def encodeWav(nFrames: Int, seed: Long): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(44 + nFrames * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      data.put("RIFF".getBytes("US-ASCII")).putInt(36 + nFrames * 2)
        .put("WAVE".getBytes("US-ASCII"))
      data.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(SampleRate).putInt(SampleRate * 2)
        .putShort(2).putShort(16) // block align, bits/sample
      data.put("data".getBytes("US-ASCII")).putInt(nFrames * 2)
      var i = 0
      while (i < nFrames) {
        data.putShort((XxHash64.hashLong(seed * 0x9E3779B97F4A7C15L + i)
          & 0xffffL).toShort)
        i += 1
      }
      data.array()
    }

    /** (frameCount, meanAbsAmplitude∈[0,1]) from the decoded samples.
      * Throws on undecodable bytes — corrupt-payload policy belongs to
      * the caller, same as [[ImageCodec.decode]]. */
    def decode(payload: Array[Byte]): (Int, Double) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"unsupported audio format: $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        require(n > 0, "empty audio payload")
        var sum = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
          sum += math.abs(s)
          i += 1
        }
        (n, sum.toDouble / n / 32768.0)
      } finally ais.close()
    }
  }

  /** 64-bit content hash over the raw payload bytes — the per-row
    * dedupe/lineage key carried alongside the decoded features. */
  def contentHash(payload: Array[Byte]): Long = XxHash64.hash(payload, 11L)

  /** Real video codec with zero new dependencies: the container is
    * length-prefixed PNG frames (magic `GVID`, LE header, then one
    * `int length + PNG bytes` record per frame), and every frame decodes
    * through the REAL [[ImageCodec]] (javax.imageio). This is an honest
    * miniature of an intra-only video format (each frame self-contained,
    * like MJPEG with PNG frames): frame count and mean luma come from
    * actually-decoded pixels, so the plumbing above it — schema, batch
    * iteration, per-partition codec reuse — is exercised against a real
    * decode loop, not a hash of the bytes. Swapping in an inter-coded
    * format (H.264 via JNI/javacv) changes only this object. */
  object VideoCodec {
    private val Magic = 0x44495647 // "GVID" little-endian

    /** Deterministic video: `nFrames` hash-seeded PNG frames of w×h. */
    def encodeVideo(width: Int, height: Int, nFrames: Int,
                    seed: Long): Array[Byte] = {
      val frames = Array.tabulate(nFrames)(f =>
        ImageCodec.encodePng(width, height, seed * 131L + f))
      val buf = java.nio.ByteBuffer
        .allocate(16 + frames.map(_.length + 4).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(Magic).putInt(nFrames).putInt(width).putInt(height)
      frames.foreach(fr => buf.putInt(fr.length).put(fr))
      buf.array()
    }

    /** (frameCount, meanLuma∈[0,1] across ALL decoded frames' pixels).
      * Throws on a corrupt container or undecodable frame — corrupt-
      * payload policy belongs to the caller, same as the other codecs. */
    def decode(payload: Array[Byte]): (Int, Double) = {
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(buf.remaining >= 16 && buf.getInt() == Magic,
        "not a GVID container")
      val nFrames = buf.getInt()
      val w = buf.getInt()
      val h = buf.getInt()
      require(nFrames > 0 && w > 0 && h > 0, "corrupt GVID header")
      var lumaSum = 0.0
      var f = 0
      while (f < nFrames) {
        // a container truncated mid-record must fail with the same
        // IllegalArgumentException family as every other corruption —
        // never a BufferUnderflowException out of getInt (ADVICE r5)
        require(buf.remaining >= 4, "corrupt GVID frame length")
        val len = buf.getInt()
        require(len > 0 && len <= buf.remaining, "corrupt GVID frame length")
        val frame = new Array[Byte](len)
        buf.get(frame)
        val (fw, fh, luma) = ImageCodec.decode(frame)
        require(fw == w && fh == h, s"frame $f is ${fw}x$fh, header says ${w}x$h")
        lumaSum += luma
        f += 1
      }
      require(buf.remaining == 0,
        s"corrupt GVID container: ${buf.remaining} trailing bytes after frame $nFrames")
      (nFrames, lumaSum / nFrames)
    }
  }

  /** Synthetic media table. Image rows carry REAL (tiny) PNG payloads with
    * hash-derived dimensions and pixels; audio rows carry REAL PCM-16 WAV
    * payloads with hash-derived frame counts and samples; video rows carry
    * REAL GVID containers (length-prefixed PNG frames) with hash-derived
    * dimensions and frame counts. */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      kind match {
        case "image" =>
          val w = 4 + ((XxHash64.hashLong(i, 2L) >>> 4) % 13).toInt
          val h = 4 + ((XxHash64.hashLong(i, 3L) >>> 4) % 13).toInt
          MediaRow(i, kind, ImageCodec.encodePng(w, h, i), w, h)
        case "audio" =>
          val frames = 64 + ((XxHash64.hashLong(i, 4L) >>> 5) % 960).toInt
          MediaRow(i, kind, WavCodec.encodeWav(frames, i),
            width = WavCodec.SampleRate, height = 1)
        case _ =>
          val w = 4 + ((XxHash64.hashLong(i, 2L) >>> 4) % 5).toInt
          val h = 4 + ((XxHash64.hashLong(i, 3L) >>> 4) % 5).toInt
          val frames = 8 + ((XxHash64.hashLong(i) >>> 5) % 56).toInt
          MediaRow(i, kind, VideoCodec.encodeVideo(w, h, frames, i), w, h)
      }
    }
  }

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * pass: one partition = one batch stream, no per-row task overhead,
    * codec state initialized once per partition. All three kinds now go
    * through REAL decoders: images via javax.imageio, audio via
    * javax.sound.sampled (mean_luma carries the mean absolute amplitude —
    * same normalized-[0,1] slot), video via the GVID container whose
    * frames decode through the same ImageIO path. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        r.kind match {
          case "image" =>
            val (_, _, luma) = ImageCodec.decode(r.payload)
            MediaFeatures(r.media_id, r.kind,
              contentHash(r.payload), n_frames = 1, mean_luma = luma)
          case "audio" =>
            val (frames, amp) = WavCodec.decode(r.payload)
            MediaFeatures(r.media_id, r.kind,
              contentHash(r.payload), frames, amp)
          case _ =>
            val (frames, luma) = VideoCodec.decode(r.payload)
            MediaFeatures(r.media_id, r.kind,
              contentHash(r.payload), frames, luma)
        }
      }
    }
  }

  /** Bounded resize over image rows (audio/video rows pass through
    * byte-identical): images whose max dimension exceeds `maxDim` are
    * scaled to fit, aspect-preserving (min 1 px/side), through the real
    * decode → raster scale → re-encode path. Same per-partition batch
    * shape as [[extractFeatures]] (the mapInPandas analog): one codec
    * context per partition, no per-row task overhead — at 100 TB the
    * payload bytes stream through one scan, never a shuffle. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(maxDim > 0, s"bad maxDim $maxDim")
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image" || math.max(r.width, r.height) <= maxDim) r
        else {
          val scale = maxDim.toDouble / math.max(r.width, r.height)
          val w2 = math.max(1, math.round(r.width * scale).toInt)
          val h2 = math.max(1, math.round(r.height * scale).toInt)
          MediaRow(r.media_id, r.kind,
            ImageCodec.resize(r.payload, w2, h2), w2, h2)
        }
      }
    }
  }

  /** Deterministic frame sampling for video rows: every k-th frame index,
    * exploded — the downstream shape a vision pipeline consumes. */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("media_id"), col("frame_idx"), col("feat_hash"))
}
