package graft.ops

import graft.core.XxHash64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video treated as opaque
  * `binary` columns + typed metadata structs, processed per-partition in
  * batches (the Scala analog of `mapInPandas`: one iterator of rows per
  * partition, batch-shaped work inside).
  *
  * Images are REAL: payloads are PNGs and [[ImageCodec]] decodes them with
  * the JDK's `javax.imageio` (width/height/mean-luma from actual pixels).
  * Audio/video codec work remains STUBBED — this container ships no
  * audio/video libraries — behind [[FakeCodec]], a deterministic fake
  * whose outputs are pure functions of the input bytes. The Spark-side
  * contract (schema, batch iteration, partitioning) is identical for both,
  * so swapping FakeCodec for a JNI/javacv decoder changes no plan shape.
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
  }

  /** Deterministic stand-in for the (absent) audio/video decoders: every
    * "feature" is a hash-derived pure function of the bytes. */
  object FakeCodec {
    def decodeFrames(payload: Array[Byte], kind: String): Int = {
      val h = XxHash64.hash(payload)
      kind match {
        case "audio" => 1 + (((h >>> 3) % 300).toInt)
        case "video" => 1 + (((h >>> 7) % 120).toInt)
        case _       => 0
      }
    }
    def meanLuma(payload: Array[Byte]): Double =
      (((XxHash64.hash(payload, 5L) >>> 9) % 256).toDouble) / 255.0
    def featureHash(payload: Array[Byte]): Long = XxHash64.hash(payload, 11L)
  }

  /** Synthetic media table. Image rows carry REAL (tiny) PNG payloads with
    * hash-derived dimensions and pixels; audio/video payloads are opaque
    * hash-derived bytes for the fake codec path. */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      if (kind == "image") {
        val w = 4 + ((XxHash64.hashLong(i, 2L) >>> 4) % 13).toInt
        val h = 4 + ((XxHash64.hashLong(i, 3L) >>> 4) % 13).toInt
        MediaRow(i, kind, ImageCodec.encodePng(w, h, i), w, h)
      } else {
        val len = 64 + ((XxHash64.hashLong(i) >>> 5) % 192).toInt
        val payload = Array.tabulate(len)(j =>
          (XxHash64.hashLong(i * 1000 + j) & 0xff).toByte)
        MediaRow(i, kind, payload,
          width = 16 * (1 + ((XxHash64.hashLong(i, 2L) >>> 4) % 64).toInt),
          height = 16 * (1 + ((XxHash64.hashLong(i, 3L) >>> 4) % 64).toInt))
      }
    }
  }

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * pass: one partition = one batch stream, no per-row task overhead,
    * codec state initialized once per partition. Image rows go through
    * the real ImageIO decode; audio/video through the documented fake. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind == "image") {
          val (_, _, luma) = ImageCodec.decode(r.payload)
          MediaFeatures(r.media_id, r.kind,
            FakeCodec.featureHash(r.payload), n_frames = 1, mean_luma = luma)
        } else {
          MediaFeatures(r.media_id, r.kind,
            FakeCodec.featureHash(r.payload),
            FakeCodec.decodeFrames(r.payload, r.kind),
            FakeCodec.meanLuma(r.payload))
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
