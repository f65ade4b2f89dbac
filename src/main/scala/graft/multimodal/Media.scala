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

  /** Average-hash (aHash) perceptual fingerprint of a media payload: the
    * canonical cheap image near-dup signature (8×8 luma grid → 64 bits,
    * bit j set when cell j is brighter than the grid mean). The DECODE is
    * the stub seam: the "luma grid" derives deterministically from the
    * payload bytes (four chained md5 digests — SQL-replayable), which
    * collapses perceptual locality to exact-payload equality; swapping in a
    * real decoder restores true perceptual behavior without touching
    * anything downstream. Brightness compares as `64·luma > Σluma` —
    * integer arithmetic, no float parity risk. Partition-local mapPartitions:
    * payloads never shuffle, only the 8-byte hash leaves the scan. */
  def aHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val luma = new Array[Int](64)
        var d = 0
        while (d < 4) {
          md.reset()
          md.update(r.payload)
          md.update(s"|$d".getBytes("UTF-8"))
          val dig = md.digest()
          var k = 0
          while (k < 16) { luma(d * 16 + k) = dig(k) & 0xff; k += 1 }
          d += 1
        }
        var sum = 0L
        var j = 0
        while (j < 64) { sum += luma(j); j += 1 }
        var h = 0L
        j = 0
        while (j < 64) {
          if (64L * luma(j) > sum) h |= (1L << j)
          j += 1
        }
        (r.media_id, h)
      }
    }.toDF("media_id", "ahash")
  }

  /** Perceptual near-dup pairs: media whose aHash differs in at most
    * `maxHamming` bits. Candidates come from an equi-join on 16-bit hash
    * BANDS — by pigeonhole, any pair within hamming distance 3 agrees on at
    * least one of the 4 bands, so for maxHamming ≤ 3 the banded join is
    * EXACT (zero misses), never all-pairs. The verify is one
    * `bit_count(xor)` per candidate. Arithmetic-shift + mask band
    * extraction reads bits the sign extension cannot reach, so Spark and
    * the SQL oracle agree on every band value. */
  def perceptualNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming in [0, 3]: 4 × 16-bit bands guarantee exactness only there")
    val hashes = aHash(media)
    val banded = hashes.select(col("media_id"), col("ahash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("ahash"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bv")))
    val l = banded.select(col("media_id").as("id1"), col("ahash").as("h1"),
      col("band"), col("bv"))
    val r = banded.select(col("media_id").as("id2"), col("ahash").as("h2"),
      col("band"), col("bv"))
    l.join(r, Seq("band", "bv"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** The [[aHash]] replay as a CTE chain ending in `h(id, ahash)` —
    * shared by the pair-join and stored-probe oracles. */
  private def aHashCtes(table: String, idCol: String,
                        textExpr: String): String =
    s"""lum AS (
         SELECT $idCol AS id,
           flatten(list_transform(generate_series(0, 3), d ->
             list_transform(generate_series(0, 15), k ->
               CAST(('0x' || substring(md5($textExpr || '|' || CAST(d AS VARCHAR)),
                 k*2 + 1, 2)) AS BIGINT)))) AS luma
         FROM $table),
       h AS (
         SELECT id,
           CAST(list_sum(list_transform(generate_series(1, 64), j ->
             CASE WHEN 64 * luma[j] > list_sum(luma)
               THEN (CASE WHEN j = 64 THEN -9223372036854775807 - 1
                     ELSE (CAST(1 AS BIGINT) << (j - 1)) END)
               ELSE 0 END)) AS BIGINT) AS ahash
         FROM lum)"""

  /** DuckDB oracle replaying [[aHash]]+[[perceptualNearDups]] over payloads
    * that are UTF-8 text (`textExpr` must reproduce the payload bytes). */
  def perceptualNearDupsOracleSql(table: String, idCol: String,
                                  textExpr: String, maxHamming: Int): String =
    s"""WITH ${aHashCtes(table, idCol, textExpr)},
       band AS (
         SELECT id, ahash, b, (ahash >> (16 * b)) & 65535 AS bv
         FROM h, (SELECT unnest(generate_series(0, 3)) AS b)),
       cand AS (
         SELECT DISTINCT l.id AS id1, r.id AS id2, l.ahash AS h1, r.ahash AS h2
         FROM band l JOIN band r ON l.b = r.b AND l.bv = r.bv AND l.id < r.id)
       SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
       FROM cand WHERE bit_count(xor(h1, h2)) <= $maxHamming
       ORDER BY id1, id2"""

  /** Stored perceptual-index rows: (media_id, ahash, band, bv, bucket) —
    * four narrow rows per media object, bucket = band·buckets +
    * (bv mod buckets), the [[graft.ops.ApproxDedup.simhashBands]] layout
    * applied to the perceptual hash: a bucket-clustered pipe keeps probes
    * to ≤ 4 partition directories and the hash rides in the row, so
    * re-upload probes never touch payload bytes. The bucket fold only
    * widens candidates (exact (band, bv) filter after the pruned read),
    * so pigeonhole exactness at Hamming ≤ 3 survives storage. */
  def perceptualBands(media: Dataset[MediaRow], buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    aHash(media).select(col("media_id"), col("ahash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("ahash"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bv")))
      .withColumn("bucket",
        col("band").cast("long") * lit(buckets.toLong) +
          pmod(col("bv"), lit(buckets.toLong)))
  }

  /** DuckDB oracle for a stored-perceptual-index PROBE of one arriving
    * media object: pigeonhole-exact at Hamming ≤ 3, so the oracle is the
    * direct formula against every stored object. */
  def perceptualProbeOracleSql(table: String, idCol: String, textExpr: String,
                               qid: Long, maxHamming: Int): String =
    s"""WITH ${aHashCtes(table, idCol, textExpr)}
       SELECT CAST($qid AS BIGINT) AS sid, a.id AS hist_id,
         CAST(bit_count(xor(a.ahash, q.ahash)) AS INT) AS hamming
       FROM h a, (SELECT ahash FROM h WHERE id = $qid) q
       WHERE a.id <> $qid
         AND bit_count(xor(a.ahash, q.ahash)) <= $maxHamming
       ORDER BY hist_id"""

  /** DuckDB oracle for a CROSS-SET perceptual probe (arriving set ×
    * history): `leftPred`/`rightPred` select the two sides over aliases
    * `a` (arriving) and `hh` (history) from the shared hash table. */
  def perceptualCrossOracleSql(table: String, idCol: String, textExpr: String,
                               leftPred: String, rightPred: String,
                               maxHamming: Int): String =
    s"""WITH ${aHashCtes(table, idCol, textExpr)}
       SELECT a.id AS sid, hh.id AS hist_id,
         CAST(bit_count(xor(a.ahash, hh.ahash)) AS INT) AS hamming
       FROM h a JOIN h hh
         ON bit_count(xor(a.ahash, hh.ahash)) <= $maxHamming
       WHERE ($leftPred) AND ($rightPred)
       ORDER BY sid, hist_id"""

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
