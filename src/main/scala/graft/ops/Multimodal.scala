package graft.ops

import graft.core.XxHash64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video treated as opaque
  * `binary` columns + typed metadata structs, processed per-partition in
  * batches (the Scala analog of `mapInPandas`: one iterator of rows per
  * partition, batch-shaped work inside).
  *
  * The actual codec work is STUBBED — this container ships no image/audio
  * libraries — behind [[FakeCodec]], a deterministic fake whose outputs
  * are pure functions of the input bytes. The Spark-side contract (schema,
  * batch iteration, partitioning) is real and tested; swapping FakeCodec
  * for a JNI/javacv decoder changes no plan shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String,
                            payload: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 feat_hash: Long, n_frames: Int,
                                 mean_luma: Double)

  /** Deterministic stand-in for the real decoder.
    * ??? -> real implementation would decode payload via an image codec;
    * here every "feature" is a hash-derived pure function of the bytes. */
  object FakeCodec {
    def decodeFrames(payload: Array[Byte], kind: String): Int = {
      val h = XxHash64.hash(payload)
      kind match {
        case "image" => 1
        case "audio" => 1 + (((h >>> 3) % 300).toInt)
        case "video" => 1 + (((h >>> 7) % 120).toInt)
        case _       => 0
      }
    }
    def meanLuma(payload: Array[Byte]): Double =
      (((XxHash64.hash(payload, 5L) >>> 9) % 256).toDouble) / 255.0
    def featureHash(payload: Array[Byte]): Long = XxHash64.hash(payload, 11L)
  }

  /** Synthetic media table (binary payloads derived from ids). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + ((XxHash64.hashLong(i) >>> 5) % 192).toInt
      val payload = Array.tabulate(len)(j =>
        (XxHash64.hashLong(i * 1000 + j) & 0xff).toByte)
      MediaRow(i, kind, payload,
        width = 16 * (1 + ((XxHash64.hashLong(i, 2L) >>> 4) % 64).toInt),
        height = 16 * (1 + ((XxHash64.hashLong(i, 3L) >>> 4) % 64).toInt))
    }
  }

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * pass: one partition = one batch stream, no per-row task overhead,
    * codec state (were it real) initialized once per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: open codec context here, once per partition
      it.map { r =>
        MediaFeatures(r.media_id, r.kind,
          FakeCodec.featureHash(r.payload),
          FakeCodec.decodeFrames(r.payload, r.kind),
          FakeCodec.meanLuma(r.payload))
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
