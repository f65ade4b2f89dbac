package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * payloads with a typed metadata struct; per-batch feature extraction runs
  * partition-wise (the Scala analogue of a Pandas-UDF `mapInPandas` stage),
  * and payload bytes never shuffle — only fixed-width features and 8-byte
  * perceptual hashes leave the scan.
  *
  * The codec work is REAL for all three modalities (r13 item 6 closed the
  * image/audio stubs; r14 item 5 closes video): image payloads are
  * genuine PNG files decoded through the JDK's ImageIO (any PNG/BMP/GIF
  * the JRE reads works — the pipeline never peeks at how the fixture was
  * built), audio payloads are genuine RIFF/WAVE PCM files walked
  * chunk-by-chunk, and video payloads are genuine RIFF/AVI containers
  * with uncompressed 24-bit DIB frames ([[AviCodec]] — the full-frames
  * AVI layout, the one video format decodable with zero external codecs;
  * MJPEG would tie decode output to a lossy, JRE-version-dependent
  * quantization the oracle could not replay). The DuckDB oracles replay
  * the decoded CONTENT (the fixture draws pixel/sample values from the
  * document text through a fixed fold, so SQL recomputes what the
  * decoders must produce) — the engine side round-trips real encoded
  * bytes.
  */
object Media {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      payload: Array[Byte],      // opaque encoded bytes (PNG / WAV / raw)
      width: Int, height: Int,   // images/video
      duration_ms: Long)         // audio/video

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int, height: Int,   // image/video: REAL decoded dimensions
      mean_luma_micro: Long,     // image/video: Σluma·1e6 div (n·255), exact
      mean_abs_sample: Long,     // audio: Σ|s| div n over 16-bit PCM samples
      n_frames_sampled: Int)     // video: REAL decoded frame count

  /** Deterministic grayscale PNG writer: zlib STORED (uncompressed)
    * deflate block, so the byte stream is a pure function of the pixels —
    * content-hash dedup keys stay content-stable across re-encodes. The
    * DECODER does not depend on this writer (ImageIO reads any PNG); the
    * writer only makes fixtures reproducible. */
  object PngCodec {
    private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = tag.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .array()
    }

    def encodeGray(w: Int, h: Int, luma: Array[Int]): Array[Byte] = {
      require(w > 0 && h > 0 && luma.length == w * h, "bad image dimensions")
      require(h * (w + 1) <= 65535, "stored-mode deflate block caps raw size")
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(0.toByte)  // color type 0: grayscale
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
        .array()
      val raw = new Array[Byte](h * (1 + w)) // filter byte 0 + pixels, per row
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raw(y * (w + 1) + 1 + x) = luma(y * w + x).toByte; x += 1 }
        y += 1
      }
      val adler = new java.util.zip.Adler32(); adler.update(raw)
      val idat = java.nio.ByteBuffer.allocate(2 + 5 + raw.length + 4)
        .put(0x78.toByte).put(0x01.toByte)  // zlib header
        .put(0x01.toByte)                    // final STORED block
        .put((raw.length & 0xff).toByte).put(((raw.length >> 8) & 0xff).toByte)
        .put((~raw.length & 0xff).toByte).put(((~raw.length >> 8) & 0xff).toByte)
        .put(raw).putInt(adler.getValue.toInt).array()
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF readers ship
      * in the JRE — no external libraries): (width, height, row-major
      * integer luma). Reads RAW raster samples — `getRGB` would push
      * grayscale pixels through a linear-gray→sRGB color-space conversion
      * and silently change every value. RGB(A) rasters reduce through the
      * integer ITU-R 601 form `(299r + 587g + 114b) div 1000`; single-band
      * rasters pass through, so the decode round-trips the encoder's
      * grayscale values bit-exactly. */
    def decodeLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val rgb = raster.getNumBands >= 3
      val luma = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          luma(y * w + x) =
            if (rgb)
              (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
                114 * raster.getSample(x, y, 2)) / 1000
            else raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      (w, h, luma)
    }
  }

  /** RIFF/WAVE PCM-16 writer + a REAL chunk-walking parser (no stub: this
    * reads any mono 16-bit PCM WAV, not just the fixture's). */
  object WavCodec {
    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)            // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    def decodePcm16(bytes: Array[Byte]): Array[Short] = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE",
        "not a RIFF/WAVE payload")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      while (pos + 8 <= bytes.length) {
        val tag = new String(bytes, pos, 4, "US-ASCII")
        val len = bb.getInt(pos + 4)
        // a corrupt negative/oversized chunk length would walk pos
        // backwards and spin this loop forever inside an executor task
        // (ADVICE r14) — reject instead of trusting the payload
        require(len >= 0 && len <= bytes.length - pos - 8,
          s"corrupt WAVE chunk '$tag': length $len at offset $pos")
        if (tag == "data") {
          val n = math.min(len, bytes.length - pos - 8) / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
          return out
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      throw new IllegalArgumentException("no data chunk in WAVE payload")
    }
  }

  /** RIFF/AVI writer + a REAL container-walking parser for uncompressed
    * 24-bit DIB frames ('00db' — the classic full-frames AVI layout,
    * decodable without any external codec): RIFF('AVI ') → LIST hdrl
    * (avih + LIST strl (strh/strf BITMAPINFOHEADER)) → LIST movi with one
    * '00db' chunk per frame, bottom-up BGR rows padded to 4 bytes. The
    * decoder walks the chunk tree generically (any writer's chunk order /
    * extra chunks work; lengths are validated like [[WavCodec]]'s), takes
    * frame geometry from the BITMAPINFOHEADER, and reduces BGR to integer
    * ITU-R 601 luma — identity for the gray fixtures, so decode
    * round-trips the encoder's values bit-exactly. This replaces the last
    * media stub: video rows now ship a genuine container the engine
    * genuinely parses. */
  object AviCodec {
    private def tag4(bb: java.nio.ByteBuffer, t: String): java.nio.ByteBuffer =
      bb.put(t.getBytes("US-ASCII"))

    def encode(w: Int, h: Int, usPerFrame: Int,
               frames: Seq[Array[Int]]): Array[Byte] = {
      require(w > 0 && h > 0 && usPerFrame > 0 && frames.nonEmpty,
        "bad video dimensions")
      require(frames.forall(_.length == w * h), "frame/dimension mismatch")
      val stride = (w * 3 + 3) / 4 * 4 // DIB rows pad to 4-byte boundaries
      val fb = stride * h
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + data.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        tag4(bb, tag).putInt(data.length).put(data).array()
      }
      def list(tp: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        tag4(tag4(bb, "LIST").putInt(4 + payload.length), tp).put(payload).array()
      }
      val avih = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(usPerFrame).putInt(fb * 1000000 / math.max(1, usPerFrame))
        .putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(fb)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
      val strh = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        tag4(tag4(bb, "vids"), "DIB ")
          .putInt(0).putShort(0).putShort(0)
          .putInt(0).putInt(usPerFrame).putInt(1000000) // scale/rate: fps = rate/scale
          .putInt(0).putInt(frames.length).putInt(fb).putInt(-1).putInt(0)
          .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
          .array()
      }
      val strf = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0) // BI_RGB
        .putInt(fb).putInt(0).putInt(0).putInt(0).putInt(0).array()
      val movi = frames.map { luma =>
        val d = new Array[Byte](fb)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = luma(y * w + x).toByte
            val off = (h - 1 - y) * stride + x * 3 // bottom-up, BGR
            d(off) = v; d(off + 1) = v; d(off + 2) = v
            x += 1
          }
          y += 1
        }
        chunk("00db", d)
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val body = hdrl ++ list("movi", movi.flatten.toArray)
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tag4(tag4(bb, "RIFF").putInt(4 + body.length), "AVI ").put(body).array()
    }

    /** (width, height, microseconds-per-frame, row-major luma per frame). */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Int]]) = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ",
        "not a RIFF/AVI payload")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var usPerFrame = 0; var w = 0; var h = 0; var bits = 0; var comp = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      def decodeDib(off: Int, len: Int): Array[Int] = {
        require(w > 0 && h > 0, "frame chunk before BITMAPINFOHEADER")
        require(comp == 0 && bits == 24,
          s"unsupported DIB frame: biCompression=$comp biBitCount=$bits")
        val stride = (w * 3 + 3) / 4 * 4
        require(len >= stride * h, "truncated DIB frame")
        val luma = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = off + (h - 1 - y) * stride + x * 3
            val b = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff
            val r = bytes(p + 2) & 0xff
            luma(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        luma
      }
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val tag = new String(bytes, pos, 4, "US-ASCII")
          val len = bb.getInt(pos + 4)
          // reject corrupt lengths before advancing — a negative length
          // would walk pos backwards and spin forever (the WavCodec rule)
          require(len >= 0 && len <= end - pos - 8,
            s"corrupt AVI chunk '$tag': length $len at offset $pos")
          tag match {
            case "LIST" => walk(pos + 12, pos + 8 + len)
            case "avih" if len >= 4 => usPerFrame = bb.getInt(pos + 8)
            case "strf" if len >= 20 =>
              w = bb.getInt(pos + 12); h = bb.getInt(pos + 16)
              bits = bb.getShort(pos + 22); comp = bb.getInt(pos + 24)
            case "00db" | "00dc" => frames += decodeDib(pos + 8, len)
            case _ => () // strh, idx1, JUNK, vendor chunks: skipped
          }
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      walk(12, bytes.length)
      require(frames.nonEmpty, "no frame chunks in AVI payload")
      (w, h, usPerFrame, frames.toSeq)
    }
  }

  /** The fixture's content fold: cell j accumulates every byte at position
    * ≡ j (mod m), mod 256 — the WHOLE text determines every cell (a
    * truncating rule would let texts sharing a prefix collide into
    * identical payloads and silently diverge from the oracle's
    * text-keyed dedup groups). SQL replay:
    * `list_sum(bytes at j, j+m, …) % 256`. */
  private def byteFold(bytes: Array[Byte], m: Int): Array[Int] = {
    val acc = new Array[Int](m)
    var k = 0
    while (k < bytes.length) {
      acc(k % m) = (acc(k % m) + (bytes(k) & 0xff)) % 256
      k += 1
    }
    acc
  }

  /** Audio fixture shape: 128 mono PCM-16 samples at 8 kHz (16 ms). */
  private val AudioSamples = 128
  private val AudioRate = 8000

  /** Video fixture frame duration: 125 ms/frame (8 fps). */
  private val VideoUsPerFrame = 125000

  /** Partition-wise feature extraction with REAL decodes — one codec pass
    * per row, streaming through partitions (the mapInPandas batch shape).
    * This is the ONLY non-codegen stage in the pipeline and it is
    * embarrassingly parallel: payload bytes never shuffle. Integer-exact
    * outputs (micro-luma, PCM units) so the oracle replays bit-for-bit. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.media_type match {
          case "image" =>
            val (w, h, luma) = PngCodec.decodeLuma(r.payload)
            MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
              w, h,
              luma.foldLeft(0L)(_ + _) * 1000000L / (luma.length.toLong * 255L),
              0L, 0)
          case "audio" =>
            val s = WavCodec.decodePcm16(r.payload)
            MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
              0, 0, 0L,
              s.foldLeft(0L)((a, v) => a + math.abs(v.toInt)) / math.max(1, s.length),
              0)
          case _ => // video: REAL container walk + DIB frame decode
            val (w, h, _, frames) = AviCodec.decode(r.payload)
            val n = frames.length.toLong * w * h
            val sum = frames.foldLeft(0L)((a, fr) => a + fr.foldLeft(0L)(_ + _))
            MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
              w, h, sum * 1000000L / (n * 255L), 0L, frames.length)
        }
      }
    }
  }

  /** One sampled video frame: `frame_payload` is the selected frame
    * re-encoded as a standalone deterministic PNG ([[PngCodec]]) — a
    * self-contained image row downstream image stages consume as-is. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, ts_ms: Long, frame_payload: Array[Byte])

  /** Resize: REAL for images (ImageIO decode → integer nearest-neighbor →
    * deterministic PNG re-encode) and video (AVI walk → per-frame
    * nearest-neighbor → re-encode at the same frame rate). Audio passes
    * through unchanged — resample semantics belong to a sample-rate
    * converter, not a raster resize. Partition-wise and shuffle-free. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    def nn(luma: Array[Int], w0: Int, h0: Int): Array[Int] = {
      val out = new Array[Int](width * height)
      var i = 0
      while (i < out.length) {
        val x = i % width; val y = i / width
        out(i) = luma((y.toLong * h0 / height).toInt * w0 +
          (x.toLong * w0 / width).toInt)
        i += 1
      }
      out
    }
    media.mapPartitions { rows =>
      rows.map { r =>
        r.media_type match {
          case "image" =>
            val (w0, h0, luma) = PngCodec.decodeLuma(r.payload)
            r.copy(payload = PngCodec.encodeGray(width, height, nn(luma, w0, h0)),
              width = width, height = height)
          case "video" =>
            val (w0, h0, us, frames) = AviCodec.decode(r.payload)
            r.copy(payload = AviCodec.encode(width, height, us,
                frames.map(nn(_, w0, h0))),
              width = width, height = height)
          case _ => r
        }
      }
    }
  }

  /** Frame sampling: one output row per sampled timestamp of each video —
    * a partition-local flatMap (frames of one video never shuffle). REAL:
    * the AVI walk yields the frame at each timestamp (index = ts ÷
    * per-frame duration, clamped to the last frame), re-encoded as a
    * standalone PNG. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    require(everyMs > 0, "frame sampling interval must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "video").flatMap { r =>
        val (w, h, us, frames) = AviCodec.decode(r.payload)
        val msPerFrame = math.max(1L, us / 1000L)
        // clamp before narrowing: duration/interval can exceed Int range
        val n = math.min(r.duration_ms / everyMs, Int.MaxValue.toLong).toInt
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          val idx = math.min(frames.length - 1L, ts / msPerFrame).toInt
          FrameRow(r.media_id, i, ts, PngCodec.encodeGray(w, h, frames(idx)))
        }
      }
    }
  }

  /** One frame-transition row per consecutive frame pair of each video. */
  final case class SceneCutRow(
      media_id: Long, frame_idx: Int, mean_abs_delta_micro: Long, is_cut: Int)

  /** Scene-cut detection — the video-curation primitive (shot segmentation
    * before per-shot sampling/dedup): mean absolute luma delta between
    * consecutive REAL decoded frames, micro-normalized by the 255 luma
    * range (`Σ|Δ|·1e6 div (n·255)` — integer-exact, oracle-replayable);
    * `is_cut` flags transitions at/above `cutThresholdMicro`.
    * Partition-local like every media stage: payloads never shuffle, only
    * (id, idx, delta) rows leave the scan. */
  def sceneCuts(media: Dataset[MediaRow],
                cutThresholdMicro: Long): Dataset[SceneCutRow] = {
    require(cutThresholdMicro >= 0, "threshold must be non-negative")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "video").flatMap { r =>
        val (w, h, _, frames) = AviCodec.decode(r.payload)
        (1 until frames.length).iterator.map { i =>
          val a = frames(i - 1); val b = frames(i)
          var sum = 0L; var j = 0
          while (j < a.length) { sum += math.abs(b(j) - a(j)); j += 1 }
          val micro = sum * 1000000L / (w.toLong * h * 255L)
          SceneCutRow(r.media_id, i, micro,
            if (micro >= cutThresholdMicro) 1 else 0)
        }
      }
    }
  }

  /** DuckDB oracle replaying [[sceneCuts]] over the fixture: frame f's
    * cell value is (fold64 + 7f) mod 256, so the per-cell delta is 7
    * except where the +7 wraps past 255 (then |7 − 256| = 249) — the
    * content-dependent wrap count is what the engine's decoded deltas
    * must reproduce. */
  def sceneCutsOracleSql(table: String, idCol: String, textExpr: String,
                         cutThresholdMicro: Long): String =
    s"""WITH mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table),
       vids AS (SELECT id, CAST(2 + mlen % 4 AS INT) AS nf,
           ${foldSql(64)} AS f64 FROM mm WHERE mlen % 3 = 2),
       fr AS (SELECT id, nf, f64, unnest(generate_series(1, nf - 1)) AS fi
              FROM vids),
       d AS (SELECT id, fi,
           list_sum(list_transform(f64, v ->
             CASE WHEN (v + 7 * (fi - 1)) % 256 <= 248 THEN 7 ELSE 249 END))
             * 1000000 // (64 * 255) AS micro
         FROM fr)
       SELECT id AS media_id, CAST(fi AS INT) AS frame_idx,
         CAST(micro AS BIGINT) AS mean_abs_delta_micro,
         CAST(CASE WHEN micro >= $cutThresholdMicro THEN 1 ELSE 0 END AS INT) AS is_cut
       FROM d ORDER BY media_id, frame_idx"""

  /** One perceptual hash per decoded video frame. */
  final case class FrameHashRow(media_id: Long, frame_idx: Int, fhash: Long)

  /** Per-frame perceptual hashes — the temporal-fingerprint primitive:
    * every decoded frame reduces to the same 8×8 aHash the image path
    * uses (nearest-neighbor grid → mean-threshold bits), so a video is a
    * SEQUENCE of 8-byte fingerprints. Partition-local; payloads never
    * shuffle, only (id, idx, hash) rows leave the scan. */
  def videoFrameHashes(media: Dataset[MediaRow]): Dataset[FrameHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "video").flatMap { r =>
        val (w, h, _, frames) = AviCodec.decode(r.payload)
        frames.iterator.zipWithIndex.map { case (fr, i) =>
          val luma = Array.tabulate(64)(j =>
            fr((j / 8 * h / 8) * w + (j % 8 * w / 8)))
          var sum = 0L; var j = 0
          while (j < 64) { sum += luma(j); j += 1 }
          var hsh = 0L; j = 0
          while (j < 64) {
            if (64L * luma(j) > sum) hsh |= (1L << j)
            j += 1
          }
          FrameHashRow(r.media_id, i, hsh)
        }
      }
    }
  }

  /** Temporal near-dup pairs — the content-ID shape: videos sharing at
    * least `minShared` DISTINCT frame hashes (re-encodes, re-uploads,
    * clipped copies). Candidates come from an equi-join on the frame
    * hash — never all-pairs — with a HOT-HASH CAP first: a frame hash
    * present in more than `maxVideosPerHash` videos (test cards, black
    * frames) is boilerplate and drops BEFORE the self-join, the same
    * quadratic-blowup guard the minhash and winnowing paths use. Output:
    * (id1, id2, shared_frames), id1 < id2. */
  def videoTemporalNearDups(media: Dataset[MediaRow], minShared: Int,
                            maxVideosPerHash: Int = 32): DataFrame = {
    require(minShared >= 1 && maxVideosPerHash >= 2, "bad temporal-dedup config")
    val d = videoFrameHashes(media).toDF()
      .select(col("media_id"), col("fhash")).distinct()
    val rare = d.groupBy(col("fhash")).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxVideosPerHash).select(col("fhash"))
    val pruned = d.join(rare, Seq("fhash"))
    pruned.select(col("fhash"), col("media_id").as("id1"))
      .join(pruned.select(col("fhash"), col("media_id").as("id2")), Seq("fhash"))
      .where(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(countDistinct(col("fhash")).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Shared CTE chain ending in `fh(id, fi, fhash)` — per-frame aHashes
    * of every video row, replaying the fixture's (fold64 + 7f) mod 256
    * frame content through the same mean-threshold bit rule as
    * [[aHashCtes]]. */
  private def frameHashCtes(table: String, idCol: String,
                            textExpr: String): String =
    s"""mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table),
       vids AS (SELECT id, CAST(2 + mlen % 4 AS INT) AS nf,
           ${foldSql(64)} AS f64 FROM mm WHERE mlen % 3 = 2),
       vf AS (SELECT id, unnest(generate_series(0, nf - 1)) AS fi, f64
              FROM vids),
       fh AS (SELECT id, fi,
           CAST(list_sum(list_transform(generate_series(1, 64), j ->
             CASE WHEN 64 * ((f64[j] + 7 * fi) % 256) >
                    list_sum(list_transform(f64, v -> (v + 7 * fi) % 256))
               THEN (CASE WHEN j = 64 THEN -9223372036854775807 - 1
                     ELSE (CAST(1 AS BIGINT) << (j - 1)) END)
               ELSE 0 END)) AS BIGINT) AS fhash
         FROM vf)"""

  /** DuckDB oracle replaying [[videoTemporalNearDups]] over the fixture:
    * the frame-hash CTEs, then the hot-cap + equi-join + distinct-count
    * replay. */
  def videoTemporalOracleSql(table: String, idCol: String, textExpr: String,
                             minShared: Int, maxVideosPerHash: Int): String =
    s"""WITH ${frameHashCtes(table, idCol, textExpr)},
       d AS (SELECT DISTINCT id, fhash FROM fh),
       rare AS (SELECT fhash FROM d GROUP BY 1
                HAVING count(*) <= $maxVideosPerHash),
       pruned AS (SELECT d.id, d.fhash FROM d JOIN rare USING (fhash))
       SELECT a.id AS id1, b.id AS id2,
         CAST(count(DISTINCT a.fhash) AS BIGINT) AS shared_frames
       FROM pruned a JOIN pruned b ON a.fhash = b.fhash AND a.id < b.id
       GROUP BY 1, 2
       HAVING count(DISTINCT a.fhash) >= $minShared
       ORDER BY id1, id2"""

  /** DuckDB oracle for the STORED frame-hash index probe: the lowest
    * video-typed doc re-uploads under id+1000000 and matches history on
    * exact frame hashes — shared-frame counts per history video. */
  def videoHashProbeOracleSql(table: String, idCol: String, textExpr: String,
                              minShared: Int): String =
    s"""WITH ${frameHashCtes(table, idCol, textExpr)},
       q AS (SELECT min(id) AS qid FROM vids),
       qfh AS (SELECT DISTINCT fhash FROM fh JOIN q ON fh.id = q.qid),
       d AS (SELECT DISTINCT id, fhash FROM fh)
       SELECT q.qid + 1000000 AS sid, d.id AS hist_id,
         CAST(count(DISTINCT d.fhash) AS BIGINT) AS shared_frames
       FROM d JOIN qfh USING (fhash) CROSS JOIN q
       GROUP BY 1, 2
       HAVING count(DISTINCT d.fhash) >= $minShared
       ORDER BY hist_id"""

  /** One loudness window per audio object. */
  final case class LoudnessRow(
      media_id: Long, win_idx: Int, mean_abs_sample: Long, is_silent: Int)

  /** Loudness segmentation / silence detection — the audio-curation
    * primitive (trim silence, drop dead segments before transcription):
    * the REAL decoded PCM stream splits into `nWindows` equal windows,
    * each reporting its mean |sample| (16-bit PCM units, integer-exact);
    * `is_silent` flags windows under `silenceThreshold`. Partition-local,
    * payloads never shuffle. */
  def loudnessWindows(media: Dataset[MediaRow], nWindows: Int,
                      silenceThreshold: Long): Dataset[LoudnessRow] = {
    require(nWindows >= 1 && silenceThreshold >= 0, "bad loudness config")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "audio").flatMap { r =>
        val s = WavCodec.decodePcm16(r.payload)
        require(s.length % nWindows == 0,
          s"sample count ${s.length} not divisible into $nWindows windows")
        val wlen = s.length / nWindows
        (0 until nWindows).iterator.map { w =>
          var sum = 0L; var j = w * wlen
          while (j < (w + 1) * wlen) { sum += math.abs(s(j).toInt); j += 1 }
          val mean = sum / wlen
          LoudnessRow(r.media_id, w, mean,
            if (mean < silenceThreshold) 1 else 0)
        }
      }
    }
  }

  /** DuckDB oracle replaying [[loudnessWindows]] over the fixture: sample
    * t is (fold128[t] − 128)·256 by construction, so |sample| =
    * |fold128[t] − 128|·256 and each window mean replays exactly. */
  def loudnessOracleSql(table: String, idCol: String, textExpr: String,
                        nWindows: Int, silenceThreshold: Long): String = {
    val wlen = AudioSamples / nWindows
    s"""WITH mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table),
       au AS (SELECT id, ${foldSql(AudioSamples)} AS f128 FROM mm
              WHERE mlen % 3 = 1),
       w AS (SELECT id, unnest(generate_series(0, ${nWindows - 1})) AS wi
             FROM au),
       m AS (SELECT w.id, w.wi,
           list_sum(list_transform(
             a.f128[(w.wi * $wlen + 1):(w.wi * $wlen + $wlen)],
             v -> abs(v - 128) * 256)) // $wlen AS mean_abs
         FROM w JOIN au a ON a.id = w.id)
       SELECT id AS media_id, CAST(wi AS INT) AS win_idx,
         CAST(mean_abs AS BIGINT) AS mean_abs_sample,
         CAST(CASE WHEN mean_abs < $silenceThreshold THEN 1 ELSE 0 END AS INT) AS is_silent
       FROM m ORDER BY media_id, win_idx"""
  }

  /** 64-cell perceptual luma grid per media object — the aHash input:
    *  - image: REAL decode (ImageIO), 8×8 nearest-neighbor sample of the
    *    luma plane (identity for the 8×8 fixtures; integer index math for
    *    any other dimensions);
    *  - audio: REAL RIFF parse, 64 bins of pairwise |sample| means — the
    *    waveform-envelope fingerprint;
    *  - video: REAL AVI walk, 8×8 nearest-neighbor sample of the FIRST
    *    frame (the thumbnail convention — re-encodes and container-level
    *    byte differences that keep frame content land at hamming 0). */
  private def lumaGrid(r: MediaRow): Array[Int] = {
    def grid8(l: Array[Int], w: Int, h: Int): Array[Int] =
      Array.tabulate(64)(j => l((j / 8 * h / 8) * w + (j % 8 * w / 8)))
    r.media_type match {
      case "image" =>
        val (w, h, l) = PngCodec.decodeLuma(r.payload)
        grid8(l, w, h)
      case "audio" =>
        val s = WavCodec.decodePcm16(r.payload)
        require(s.length >= 128, "audio fingerprint needs ≥128 samples")
        Array.tabulate(64)(j =>
          (math.abs(s(2 * j).toInt) + math.abs(s(2 * j + 1).toInt)) / 2)
      case _ =>
        val (w, h, _, frames) = AviCodec.decode(r.payload)
        grid8(frames.head, w, h)
    }
  }

  /** Average-hash (aHash) perceptual fingerprint: 64-cell luma grid →
    * 64 bits, bit j set when cell j is brighter than the grid mean
    * (compared as `64·luma > Σluma` — integer arithmetic, no float parity
    * risk). Image/audio grids come from REAL decodes ([[lumaGrid]]).
    * Partition-local mapPartitions: payloads never shuffle, only the
    * 8-byte hash leaves the scan. */
  def aHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val luma = lumaGrid(r)
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

  /** The fixture content fold as SQL: cell j of an m-cell grid sums the
    * text bytes at positions ≡ j (mod m), mod 256 — ≡ [[byteFold]]. */
  private def foldSql(m: Int): String =
    s"""list_transform(generate_series(0, ${m - 1}), j ->
         coalesce(list_sum(list_transform(
           generate_series(j, mlen - 1, $m),
           k -> ord(substring(mtext, CAST(k AS INT) + 1, 1)))), 0) % 256)"""

  /** The [[aHash]] replay as a CTE chain ending in `h(id, ahash)`: the
    * oracle recomputes the luma grid the DECODERS must produce — image
    * pixels / audio samples / video frame-0 pixels are the text fold by
    * construction of [[fromDocuments]] (video frame 0's offset is 7·0 =
    * 0, so its grid IS the plain fold) — then the same integer bit rule.
    * `textExpr` must reproduce the document text. */
  private def aHashCtes(table: String, idCol: String,
                        textExpr: String): String =
    s"""mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table),
       lum AS (
         SELECT id,
           CASE CAST(mlen % 3 AS INT)
             WHEN 1 THEN list_transform(generate_series(0, 63), j ->
               (abs(f128[CAST(2*j AS INT) + 1] - 128) * 256
                + abs(f128[CAST(2*j+1 AS INT) + 1] - 128) * 256) // 2)
             ELSE ${foldSql(64)}
           END AS luma
         FROM (SELECT id, mtext, mlen, ${foldSql(128)} AS f128 FROM mm)),
       h AS (
         SELECT id,
           CAST(list_sum(list_transform(generate_series(1, 64), j ->
             CASE WHEN 64 * luma[j] > list_sum(luma)
               THEN (CASE WHEN j = 64 THEN -9223372036854775807 - 1
                     ELSE (CAST(1 AS BIGINT) << (j - 1)) END)
               ELSE 0 END)) AS BIGINT) AS ahash
         FROM lum)"""

  /** DuckDB oracle replaying [[aHash]]+[[perceptualNearDups]] over the
    * [[fromDocuments]] fixture (`textExpr` must reproduce the text the
    * payloads were built from). */
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

  /** DuckDB oracle for content-hash dedup over the fixture: groups key on
    * exactly what determines the payload bytes (type + decoded content),
    * since SQL cannot re-encode PNG/WAV to replay the engine's
    * sha2(payload) key itself. */
  def contentDedupOracleSql(table: String, idCol: String,
                            textExpr: String): String =
    s"""WITH mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table),
       ck AS (SELECT id,
           CASE CAST(mlen % 3 AS INT)
             WHEN 0 THEN 'i|' || CAST(${foldSql(64)} AS VARCHAR)
             WHEN 1 THEN 'a|' || CAST(${foldSql(128)} AS VARCHAR)
             ELSE 'v|' || CAST(2 + mlen % 4 AS VARCHAR) || '|'
                       || CAST(${foldSql(64)} AS VARCHAR)
           END AS k
         FROM mm)
       SELECT count(*) AS n_copies, min(id) AS keeper_id
       FROM ck GROUP BY k ORDER BY keeper_id"""

  /** DuckDB oracle replaying [[extractFeatures]] over the fixture: the
    * decoded content is the text fold by construction, the container
    * sizes are closed-form (stored-mode PNG: rendered as the 8×8 literal;
    * WAV: 44 + 2·samples; AVI: fixed 224-byte header tree + one 200-byte
    * '00db' chunk per 8×8 DIB frame). */
  def featuresOracleSql(table: String, idCol: String,
                        textExpr: String): String = {
    val pngBytes = 8 + 25 + (12 + 2 + 5 + 8 * 9 + 4) + 12 // = 140 for 8×8 gray
    val wavBytes = 44 + 2 * AudioSamples                  // = 300
    // AVI at 8×8: RIFF hdr 12 + hdrl LIST (12 + avih 64 + strl LIST 124)
    // + movi LIST hdr 12; per frame: 8-byte chunk hdr + 8 rows × 24-byte
    // stride
    val aviHeader = 12 + (12 + 64 + (12 + 64 + 48)) + 12  // = 224
    val aviFrame  = 8 + 8 * 24                            // = 200
    s"""WITH mm AS (SELECT $idCol AS id, $textExpr AS mtext,
           length($textExpr) AS mlen FROM $table)
       SELECT id AS media_id,
         CASE CAST(mlen % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS media_type,
         CAST(CASE CAST(mlen % 3 AS INT) WHEN 0 THEN $pngBytes
           WHEN 1 THEN $wavBytes
           ELSE $aviHeader + (2 + mlen % 4) * $aviFrame END AS BIGINT) AS n_bytes,
         CAST(CASE CAST(mlen % 3 AS INT) WHEN 1 THEN 0 ELSE 8 END AS INT) AS width,
         CAST(CASE CAST(mlen % 3 AS INT) WHEN 1 THEN 0 ELSE 8 END AS INT) AS height,
         CAST(CASE WHEN mlen % 3 = 0
           THEN list_sum(${foldSql(64)}) * 1000000 // (64 * 255)
           WHEN mlen % 3 = 2
           THEN list_sum(flatten(list_transform(
                  generate_series(0, CAST(mlen % 4 AS INT) + 1),
                  f -> list_transform(${foldSql(64)}, v -> (v + 7*f) % 256))))
                * 1000000 // ((2 + mlen % 4) * 64 * 255)
           ELSE 0 END AS BIGINT) AS mean_luma_micro,
         CAST(CASE WHEN mlen % 3 = 1
           THEN list_sum(list_transform(${foldSql(128)},
                  v -> abs(v - 128) * 256)) // $AudioSamples
           ELSE 0 END AS BIGINT) AS mean_abs_sample,
         CAST(CASE WHEN mlen % 3 = 2 THEN 2 + mlen % 4
           ELSE 0 END AS BIGINT) AS n_frames
       FROM mm ORDER BY media_id"""
  }

  /** Build a deterministic media table from the documents table: REAL
    * encoded payloads whose decoded content is a fixed fold of the text
    * bytes (so the oracle recomputes expected decode outputs from SQL,
    * while the engine round-trips genuine PNG/WAV/AVI bytes). The media
    * TYPE derives from the text length (content-stable: a re-upload under
    * a shifted id keeps its type, payload, and perceptual hash). Video:
    * 2 + len%4 DIB frames of 8×8, frame f's cell j = (fold64[j] + 7f)
    * mod 256 — per-frame drift the oracle replays with one
    * generate_series. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          // The oracles replay the fold with length()/ord(substring())
          // over CHARACTERS while the engine folds UTF-8 BYTES — equal
          // only for ASCII text (ADVICE r14). Enforce the fixture
          // contract loudly instead of silently diverging on the first
          // non-ASCII document.
          require(bytes.length == text.length,
            s"media fixture requires ASCII document text (doc_id=$id)")
          (bytes.length % 3) match {
            case 0 =>
              MediaRow(id, "image",
                PngCodec.encodeGray(8, 8, byteFold(bytes, 64)), 8, 8, 0L)
            case 1 =>
              val f = byteFold(bytes, AudioSamples)
              val samples = Array.tabulate[Short](AudioSamples)(t =>
                ((f(t) - 128) * 256).toShort)
              MediaRow(id, "audio", WavCodec.encodePcm16(samples, AudioRate),
                0, 0, AudioSamples.toLong * 1000L / AudioRate)
            case _ =>
              val f = byteFold(bytes, 64)
              val nf = 2 + bytes.length % 4
              val frames = Seq.tabulate(nf)(fr =>
                Array.tabulate(64)(j => (f(j) + 7 * fr) % 256))
              MediaRow(id, "video",
                AviCodec.encode(8, 8, VideoUsPerFrame, frames),
                8, 8, nf.toLong * VideoUsPerFrame / 1000L)
          }
        }
      }
  }
}
