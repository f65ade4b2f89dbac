package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * payloads with a typed metadata struct; per-batch feature extraction runs
  * partition-wise (the Scala analogue of a Pandas-UDF `mapInPandas` stage).
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind [[MediaCodec]], with a deterministic fake so the
  * Spark-side contract (schema, partitioning, batch shape) is real and
  * tested. Swap the codec body for javacv/ffmpeg bindings in production.
  */
object Media {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      payload: Array[Byte],      // opaque encoded bytes
      width: Int, height: Int,   // images/video
      duration_ms: Long)         // audio/video

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      // stubbed decode outputs:
      mean_luma: Double,         // image/video
      n_frames_sampled: Int,     // video frame sampling
      rms_level: Double)         // audio

  /** The codec seam. Production: real decoders. Here: deterministic fake
    * derived from the payload bytes so tests are stable. */
  object MediaCodec {
    def decodeStub(r: MediaRow): MediaFeatures = {
      val s = r.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
      MediaFeatures(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = r.payload.length.toLong,
        mean_luma = math.abs(s % 256).toDouble / 255.0,
        n_frames_sampled = if (r.media_type == "video") (r.duration_ms / 1000).toInt else 0,
        rms_level = if (r.media_type == "audio") math.abs(s % 1000).toDouble / 1000.0 else 0.0)
    }
  }

  /** Partition-wise feature extraction — one codec instance per partition,
    * streaming through rows (the mapInPandas batch shape). This is the ONLY
    * non-codegen stage in the pipeline, and it is embarrassingly parallel:
    * payload bytes never shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive library handle)
      rows.map(MediaCodec.decodeStub)
    }
  }

  /** One sampled video frame (decoded payload stub). */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, ts_ms: Long, frame_payload: Array[Byte])

  /** Stub resize: payload re-encoded for the new dimensions (here a
    * deterministic size-proportional truncation/extension), dims updated.
    * Partition-wise and shuffle-free — the real implementation swaps only
    * the codec body. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // Long arithmetic end-to-end, clamped BEFORE the Int narrowing: a
        // large upscale would otherwise wrap .toInt and silently truncate
        // the payload to ~1 byte
        val scaled = r.payload.length.toLong * (width.toLong * height) /
          math.max(1L, r.width.toLong * r.height)
        val targetLen = math.max(1L, math.min(scaled, Int.MaxValue.toLong)).toInt
        val out = java.util.Arrays.copyOf(r.payload, targetLen)
        r.copy(payload = out, width = width, height = height)
      }
    }
  }

  /** Frame sampling: one output row per sampled timestamp of each video —
    * a partition-local flatMap (frames of one video never shuffle). The
    * frame decode is the stubbed byte slice; everything around it (row
    * explosion, schema, batch shape) is the production contract. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    require(everyMs > 0, "frame sampling interval must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "video").flatMap { r =>
        // clamp before narrowing: duration/interval can exceed Int range
        val n = math.min(r.duration_ms / everyMs, Int.MaxValue.toLong).toInt
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          val off = if (r.payload.isEmpty) 0
                    else (ts % math.max(1, r.payload.length)).toInt
          val len = math.min(16, r.payload.length - off)
          FrameRow(r.media_id, i, ts,
            java.util.Arrays.copyOfRange(r.payload, off, off + math.max(0, len)))
        }
      }
    }
  }

  /** Build a deterministic media table from the documents table — payload =
    * utf-8 bytes of the text (stand-in for image bytes), metadata derived
    * from doc fields. Real pipelines read these from object storage. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[MediaRow]
  }
}
