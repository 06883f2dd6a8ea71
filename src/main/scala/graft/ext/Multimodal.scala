package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extract run batch-wise over partitions (the Scala analogue of
  * `mapInPandas`: one iterator of bounded batches per task, so decoder
  * state — a model, a codec — is initialized once per batch, never per
  * row, and memory stays bounded regardless of partition size).
  *
  * The actual codec calls are STUBBED (no image/audio libs in this
  * environment): [[StubCodecs]] derives deterministic fake outputs from
  * the bytes. The Spark-side plumbing — schema, batch shape, partition
  * sizing, null/corrupt handling — is real and tested; swapping a real
  * decoder in changes only the function body marked STUB.
  */
object Multimodal {

  /** Canonical media schema: id + raw bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap a (id, binary) DataFrame into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              format: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(binCol).as("content"),
      struct(lit(format).as("format"),
        coalesce(length(col(binCol)).cast("long"), lit(0L)).as("n_bytes")).as("meta"))

  final case class ImageInfo(mediaId: Long, width: Int, height: Int,
                             channels: Int, ok: Boolean)
  final case class AudioInfo(mediaId: Long, sampleRate: Int, channels: Int,
                             bitsPerSample: Int, ok: Boolean)
  final case class MediaFeature(mediaId: Long, feature: Array[Float])

  /** Batch-wise decode: partitions stream through in `batchSize` groups
    * (mapInPandas batch shape). Corrupt/null content yields ok=false rows
    * instead of failing the task (quarantine semantics, F9).
    *
    * PNM (P5/P6) headers are REALLY parsed ([[HeaderCodecs.parsePpmHeader]]):
    * genuinely malformed bytes — bad magic digit, zero dims, truncated
    * raster — quarantine. Other formats fall back to the deterministic
    * stub dims (full-frame codecs unavailable here; see [[StubCodecs]]). */
  def decodeImages(media: DataFrame, batchSize: Int = 64): Dataset[ImageInfo] = {
    implicit val enc: Encoder[ImageInfo] = Encoders.product[ImageInfo]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would happen here (codec/model)
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null || bytes.length < 4)
            ImageInfo(id, 0, 0, 0, ok = false)
          else if (HeaderCodecs.isPnm(bytes))
            HeaderCodecs.parsePpmHeader(bytes) match {
              case Some((w, h, c)) => ImageInfo(id, w, h, c, ok = true)
              case None            => ImageInfo(id, 0, 0, 0, ok = false)
            }
          else {
            val (w, h, c) = StubCodecs.decodeDims(bytes)
            ImageInfo(id, w, h, c, ok = true)
          }
        }
      }
    }
  }

  /** Batch-wise audio probe: WAV RIFF headers are REALLY parsed; anything
    * that is not a well-formed RIFF/WAVE with a valid fmt chunk
    * quarantines as ok=false. */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): Dataset[AudioInfo] = {
    implicit val enc: Encoder[AudioInfo] = Encoders.product[AudioInfo]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val parsed = Option(bytes).flatMap(HeaderCodecs.parseWavHeader)
          parsed match {
            case Some((rate, ch, bits)) => AudioInfo(id, rate, ch, bits, ok = true)
            case None                   => AudioInfo(id, 0, 0, 0, ok = false)
          }
        }
      }
    }
  }

  final case class RasterStats(mediaId: Long, nPx: Long, sumPx: Long,
                               minPx: Long, maxPx: Long, ok: Boolean)

  /** Batch-wise REAL pixel decode for binary PNM with maxval < 256: the
    * raster bytes after the parsed header offset are the pixels (P5
    * gray: 1/px; P6 RGB: 3 samples/px — counted as samples here), read
    * UNSIGNED (`& 255` — the negative-byte trap) into exact integer
    * sum/min/max. This is not a stub: it is the complete decoder for
    * the format, which is the point of using PNM as the catalog's image
    * container. 16-bit-maxval files and malformed/truncated bytes
    * quarantine as ok=false (quarantine semantics, F9). */
  /** One unsigned-byte raster scan: (n, sum, min, max) of the decoded
    * pixels, or None if the bytes are not a complete 8-bit PNM. Shared
    * by [[imageRasterStats]] and the [[mediaStats]] dispatcher. */
  private def pixelScan(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    Option(bytes).flatMap(HeaderCodecs.parsePpmRaster).collect {
      case (w, h, c, off, 1) =>
        val n = w.toLong * h * c
        var i = off
        val end = off + n.toInt
        var s = 0L
        var mn = 255L
        var mx = 0L
        while (i < end) {
          val v = (bytes(i) & 0xFF).toLong
          s += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (n, s, mn, mx)
    }

  def imageRasterStats(media: DataFrame,
                       batchSize: Int = 64): Dataset[RasterStats] = {
    implicit val enc: Encoder[RasterStats] = Encoders.product[RasterStats]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          pixelScan(bytes) match {
            case Some((n, s, mn, mx)) => RasterStats(id, n, s, mn, mx, ok = true)
            case None                 => RasterStats(id, 0L, 0L, 0L, 0L, ok = false)
          }
        }
      }
    }
  }

  final case class AHash(mediaId: Long, b0: Long, b1: Long, b2: Long,
                         b3: Long, ok: Boolean)

  /** 8×8 AVERAGE-HASH over a decoded P5 raster — the IMAGE near-dup
    * fingerprint (the pHash family's integer-exact member): sample a
    * fixed 8×8 grid by nearest-neighbor index mapping (sample (by, bx)
    * reads raster[⌊by·h/8⌋·w + ⌊bx·w/8⌋] — defined for every w, h ≥ 1,
    * no resampling arithmetic), mean = ⌊Σ/64⌋, bit = sample > mean
    * (strict, deterministic ties). The 64 bits ship as FOUR 16-bit
    * band integers (bit b → band b div 16, weight 2^(b mod 16)) — the
    * exact shape the x5 SimHash banding consumes, and small enough
    * that no signed-overflow corner exists. Every step is integer
    * arithmetic on bytes the seeded-raster oracle can replay. P6 /
    * 16-bit-maxval / truncated files quarantine ok = false (the x14c
    * contract). Batch-wise mapPartitions, the prescribed multimodal
    * shape. */
  def imageAHash8(media: DataFrame, batchSize: Int = 64): Dataset[AHash] = {
    implicit val enc: Encoder[AHash] = Encoders.product[AHash]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Option(bytes).flatMap(HeaderCodecs.parsePpmRaster) match {
            case Some((w, h, 1, off, 1)) =>
              val samples = new Array[Long](64)
              var s = 0L
              var b = 0
              while (b < 64) {
                val by = b / 8
                val bx = b % 8
                val idx = (by.toLong * h / 8) * w + (bx.toLong * w / 8)
                val v = (bytes(off + idx.toInt) & 0xFF).toLong
                samples(b) = v
                s += v
                b += 1
              }
              val mean = s / 64
              val bands = Array(0L, 0L, 0L, 0L)
              b = 0
              while (b < 64) {
                if (samples(b) > mean)
                  bands(b / 16) |= (1L << (b % 16))
                b += 1
              }
              AHash(id, bands(0), bands(1), bands(2), bands(3), ok = true)
            case _ => AHash(id, 0L, 0L, 0L, 0L, ok = false)
          }
        }
      }
    }
  }

  /** Banded near-dup candidate pairs over [[imageAHash8]] fingerprints
    * with exact Hamming verification — image dedup joining the x3/x5
    * LSH discipline: candidates must agree on at least one of the four
    * 16-bit bands (a Hamming-≤3 pair ALWAYS shares a band by
    * pigeonhole, so recall is exact up to maxHamming = 3; 4..7 is
    * best-effort, above 7 refuses), then the true distance
    * Σ bit_count(band XOR band) filters. Quarantined hashes carry no
    * bands. The join keys on (band index, band value) — bucketed,
    * never all-pairs; a giant identical-image cluster lands in one
    * bucket, which is the documented x62-style hot-band regime, never
    * a cartesian. Returns (a_id, b_id, hamming). */
  def ahashNearDup(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (pigeonhole-exact to 3): $maxHamming")
    val h = hashes.filter(col("ok"))
      .select(col("mediaId"), col("b0"), col("b1"), col("b2"), col("b3"))
    val bands = h.select(col("mediaId"),
      explode(array((0 to 3).map(j =>
        struct(lit(j).as("j"), col(s"b$j").as("v"))): _*)).as("_ah_b"))
      .select(col("mediaId"), col("_ah_b.j").as("_ah_j"),
        col("_ah_b.v").as("_ah_v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x._ah_j") === col("y._ah_j") &&
          col("x._ah_v") === col("y._ah_v") &&
          col("x.mediaId") < col("y.mediaId"))
      .select(col("x.mediaId").as("a_id"), col("y.mediaId").as("b_id"))
      .distinct()
    cand.join(h.toDF("a_id", "_a0", "_a1", "_a2", "_a3"), Seq("a_id"))
      .join(h.toDF("b_id", "_b0", "_b1", "_b2", "_b3"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (0 to 3).map(j => bit_count(col(s"_a$j").bitwiseXOR(col(s"_b$j"))))
          .reduce(_ + _).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Batch-wise feature extraction: binary → fixed-dim float vector
    * (joins the ANN/near-dup pipeline via graft.ext.Similarity). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          MediaFeature(r.getLong(0), StubCodecs.embed(bytes, dim))
        }
      }
    }
  }

  /** Video frame sampling: every `stride`-th frame index up to nFrames
    * (frame boundaries from metadata; extraction itself is the decode
    * stub's job). Pure column expression — no data movement. */
  def sampleFrameIndexes(media: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))))

  /** Little-endian fixed-width integer bytes as a binary column (the
    * RIFF/WAV byte order). Pure codegen projection: per byte, shift +
    * mask + hex, then one unhex over the concatenated pair digits. The
    * &255 mask (not %) keeps each byte in [0,255] even for negative
    * inputs (two's complement), where a modulo would emit a 16-digit
    * negative hex that lpad silently truncates to the wrong byte. */
  private def leBytes(c: Column, nBytes: Int): Column =
    unhex(concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(c.cast("bigint"), 8 * i).bitwiseAND(lit(255L))),
        2, "0")): _*))

  /** Binary-PNM (P5, maxval 255) test-pattern blob: a spec-correct header
    * plus `rasterLen` filler raster bytes — pass `width*height` for a
    * well-formed image, anything less to synthesize a truncated file the
    * decoder must quarantine. Lets codec plumbing be exercised (and
    * oracle-checked end-to-end) without any media library: the blob is a
    * pure column expression, the parse-back is [[HeaderCodecs]]. */
  def pnmBlob(width: Column, height: Column, rasterLen: Column): Column =
    concat(format_string("P5\n%d %d\n255\n", width, height).cast("binary"),
      call_function("repeat", lit("x"),
        greatest(lit(0), rasterLen).cast("int")).cast("binary"))

  /** [[pnmBlob]] with a SEEDED raster: byte i of the raster is
    * `(seed + i) mod 256` — so pixel CONTENT (not just the header) is a
    * replayable formula, and a real pixel decode can be oracle-checked
    * against the generator (the x14b discipline extended to the
    * raster). Pass `rasterLen < width·height` for a truncated file the
    * decoder must quarantine. */
  def pnmPatternBlob(width: Column, height: Column, seed: Column,
                     rasterLen: Column): Column = {
    val n = greatest(rasterLen.cast("long"), lit(0L))
    // n == 0 must not reach sequence(0, -1): Spark sequences DESCEND
    // when start > stop, so the empty raster is its own branch
    val hexRaster = when(n === 0, lit("")).otherwise(
      array_join(transform(sequence(lit(0L), n - 1),
        i => lpad(hex(pmod(seed.cast("bigint") + i, lit(256L))), 2, "0")), ""))
    concat(format_string("P5\n%d %d\n255\n", width, height).cast("binary"),
      unhex(hexRaster))
  }

  final case class PcmStats(mediaId: Long, nSamples: Long, sumAmp: Long,
                            minAmp: Long, maxAmp: Long, ok: Boolean)

  /** Batch-wise REAL sample decode for 16-bit PCM WAV — the audio
    * column's pixel moment (the x14c discipline: x14b proved the RIFF
    * header, this decodes the payload): the `data` chunk's bytes are
    * little-endian SIGNED 16-bit samples, folded into exact integer
    * count/sum/min/max — the loudness/DC-offset/clipping signals an
    * audio-curation pass reads. Non-16-bit formats, a missing or
    * odd-length data chunk, and truncated files quarantine ok = false
    * (quarantine semantics, F9); a legal empty data chunk reads 0
    * samples with the min/max identity sentinels (32767/−32768)
    * replayed by the oracle. */
  /** One signed-16-bit LE sample scan: (n, sum, min, max) of the data
    * chunk, or None unless the bytes are a complete 16-bit PCM WAV.
    * Shared by [[audioPcmStats]] and the [[mediaStats]] dispatcher. */
  private def pcmScan(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    Option(bytes).flatMap(HeaderCodecs.parseWavData).collect {
      case (_, _, 16, off, len) if len % 2 == 0 =>
        var i = off
        val end = off + len
        var n = 0L
        var s = 0L
        var mn = 32767L
        var mx = -32768L
        while (i < end) {
          val v = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toLong
          s += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          n += 1
          i += 2
        }
        (n, s, mn, mx)
    }

  def audioPcmStats(media: DataFrame, batchSize: Int = 64): Dataset[PcmStats] = {
    implicit val enc: Encoder[PcmStats] = Encoders.product[PcmStats]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          pcmScan(bytes) match {
            case Some((n, s, mn, mx)) => PcmStats(id, n, s, mn, mx, ok = true)
            case None                 => PcmStats(id, 0L, 0L, 0L, 0L, ok = false)
          }
        }
      }
    }
  }

  final case class MediaStats(mediaId: Long, kind: String, n: Long,
                              total: Long, lo: Long, hi: Long, ok: Boolean)

  /** MIXED-modality feature extraction behind ONE schema: the media
    * frame is sniffed per blob by its magic bytes and dispatched to the
    * REAL decoder for its kind — PNM rasters to the unsigned pixel scan
    * ([[imageRasterStats]]'s), RIFF/WAVE payloads to the signed 16-bit
    * PCM scan ([[audioPcmStats]]'s) — yielding the common
    * (kind, n, total, lo, hi) moment row a curation pass consumes
    * without caring which modality produced it. A recognized container
    * with a truncated/unsupported payload quarantines under its
    * SNIFFED kind (the header is what identified it); unrecognized or
    * null bytes quarantine as kind "unknown". Batch-wise mapPartitions,
    * the prescribed multimodal shape — one pass, no shuffle. */
  def mediaStats(media: DataFrame, batchSize: Int = 64): Dataset[MediaStats] = {
    implicit val enc: Encoder[MediaStats] = Encoders.product[MediaStats]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          // length guard only to the shortest sniffable magic (2 bytes:
          // "P5"/"P6"): a 2-3 byte PNM-magic blob must quarantine under
          // kind "image" exactly as imageRasterStats classifies it —
          // isRiffWave self-guards at its own 12-byte header
          if (bytes == null || bytes.length < 2)
            MediaStats(id, "unknown", 0L, 0L, 0L, 0L, ok = false)
          else if (HeaderCodecs.isPnm(bytes))
            pixelScan(bytes) match {
              case Some((n, s, mn, mx)) =>
                MediaStats(id, "image", n, s, mn, mx, ok = true)
              case None => MediaStats(id, "image", 0L, 0L, 0L, 0L, ok = false)
            }
          else if (HeaderCodecs.isRiffWave(bytes))
            pcmScan(bytes) match {
              case Some((n, s, mn, mx)) =>
                MediaStats(id, "audio", n, s, mn, mx, ok = true)
              case None => MediaStats(id, "audio", 0L, 0L, 0L, 0L, ok = false)
            }
          else MediaStats(id, "unknown", 0L, 0L, 0L, 0L, ok = false)
        }
      }
    }
  }

  /** [[wavBlob]] extended with a SEEDED 16-bit `data` chunk: sample i
    * is the unsigned 16-bit value (seed + i) mod 65536 (signed
    * interpretation u − 65536 above 32767), laid out little-endian —
    * so sample CONTENT is a replayable formula and the real PCM decode
    * oracle-checks against the generator (the pnmPatternBlob
    * discipline for audio). The declared data size is 2·nSamples;
    * pass `emitBytes < 2·nSamples` to synthesize a truncated file the
    * decoder must quarantine. */
  def wavPatternBlob(rate: Column, channels: Column, seed: Column,
                     nSamples: Column, emitBytes: Column): Column = {
    val nb = greatest(emitBytes.cast("long"), lit(0L))
    // byte j: even → low byte (seed + j/2) mod 256; odd → high byte
    // ((seed + (j−1)/2) mod 65536) div 256. Empty body is its own
    // branch (Spark sequences DESCEND when start > stop).
    val hexBody = when(nb === 0, lit("")).otherwise(
      array_join(transform(sequence(lit(0L), nb - 1), j => {
        val i = (j - pmod(j, lit(2L))) / 2
        val u = pmod(seed.cast("bigint") + i, lit(65536L))
        lpad(hex(when(pmod(j, lit(2L)) === 0, pmod(u, lit(256L)))
          .otherwise(shiftright(u, 8))), 2, "0")
      }), ""))
    concat(wavBlob(rate, channels, lit(16)),
      lit("data").cast("binary"),
      leBytes(nSamples.cast("bigint") * 2, 4),
      unhex(hexBody))
  }

  /** WAV RIFF test-pattern blob: RIFF header + fmt chunk carrying the
    * given rate/channels/bits (PCM; `bits` should be a multiple of 8 —
    * the derived byte-rate/block-align fields floor-divide by 8). `magic`
    * other than "RIFF" synthesizes a corrupt container the decoder must
    * quarantine. */
  def wavBlob(rate: Column, channels: Column, bits: Column,
              magic: Column = lit("RIFF")): Column = {
    val bps = shiftright(bits.cast("bigint"), 3) // bytes per sample
    // RIFF size = total length minus the 8-byte (magic, size) prelude: the
    // blob is 36 bytes (4 magic + 4 size + 8 "WAVEfmt " + 4 fmt-len + 16
    // fmt fields), so 28 — a strict consumer walking by RIFF size must not
    // over-read (the in-repo parser ignores the field either way)
    concat(magic.cast("binary"), leBytes(lit(28), 4),
      lit("WAVEfmt ").cast("binary"), leBytes(lit(16), 4),
      leBytes(lit(1), 2), leBytes(channels, 2), leBytes(rate, 4),
      leBytes(rate * channels * bps, 4), leBytes(channels * bps, 2),
      leBytes(bits, 2))
  }
}

/** REAL header parsers for trivially-parseable container formats —
  * binary PNM (P5 gray / P6 RGB) and WAV RIFF. These are complete,
  * spec-faithful header decoders (not stubs): corrupt-input quarantine is
  * exercised by genuinely malformed bytes. Only FULL-FRAME decoding
  * (pixels/samples) stays stubbed, in [[StubCodecs]]. */
object HeaderCodecs {

  def isPnm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')

  /** P5/P6 header: magic, whitespace-and-`#`-comment separated width,
    * height, maxval, one whitespace, then the raster. Valid only when the
    * dims are positive, maxval ∈ [1, 65535], and the payload actually
    * holds a full raster (truncated files quarantine). Returns
    * (width, height, channels). */
  def parsePpmHeader(b: Array[Byte]): Option[(Int, Int, Int)] =
    parsePpmRaster(b).map { case (w, h, c, _, _) => (w, h, c) }

  /** [[parsePpmHeader]] plus what a PIXEL decoder needs: the raster
    * offset and bytes-per-sample. Returns (width, height, channels,
    * rasterOffset, bytesPerSample). */
  def parsePpmRaster(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (!isPnm(b)) return None
    val channels = if (b(1) == '6') 3 else 1
    var pos = 2
    def skipWs(): Boolean = {
      var seen = false
      var go = true
      while (go && pos < b.length) {
        val c = b(pos).toChar
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1; seen = true }
        else if (c.isWhitespace) { pos += 1; seen = true }
        else go = false
      }
      seen
    }
    def readInt(): Option[Int] = {
      if (!skipWs()) return None
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0')
        any = true
        if (v > Int.MaxValue) return None
        pos += 1
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if w > 0 && h > 0 && maxv >= 1 && maxv <= 65535
      if pos < b.length && b(pos).toChar.isWhitespace // single raster separator
      bytesPerSample = if (maxv < 256) 1 else 2
      if b.length - (pos + 1) >= w.toLong * h * channels * bytesPerSample
    } yield (w, h, channels, pos + 1, bytesPerSample)
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  def isRiffWave(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Walk RIFF chunks to the `fmt ` chunk; returns (sampleRate, channels,
    * bitsPerSample). Truncated fmt chunks, zero channels/rate, or a
    * missing fmt chunk all fail (→ quarantine). */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isRiffWave(b)) return None
    // Long cursor: a hostile chunk declaring a size near 2^32 must fall
    // out of the loop (→ None/quarantine), never wrap an Int cursor
    // negative and throw out of new String.
    var pos = 12L
    while (pos + 8 <= b.length) {
      val p = pos.toInt // loop bound proves pos+8 <= b.length, so it fits
      val id = new String(b, p, 4, "US-ASCII")
      val size = le32(b, p + 4) // unsigned 32-bit, always in [0, 2^32)
      if (id == "fmt ") {
        if (size < 16 || pos + 8 + 16 > b.length) return None
        val channels = le16(b, p + 10)
        val rate = le32(b, p + 12)
        val bits = le16(b, p + 22)
        return if (channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0)
          Some((rate.toInt, channels, bits))
        else None
      }
      pos += 8L + size + (size & 1L) // chunks are 16-bit aligned
    }
    None
  }

  /** [[parseWavHeader]] extended to the PAYLOAD: walks the chunk list
    * for BOTH `fmt ` and `data`, returning (rate, channels, bits,
    * dataOffset, dataLen) — the complete contract a sample decoder
    * needs. The data chunk's declared size must fit inside the blob
    * (truncated files return None → quarantine); fmt validation is
    * [[parseWavHeader]]'s. Chunk order is free (LIST/other chunks are
    * skipped, data-before-fmt is legal RIFF). */
  def parseWavData(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (!isRiffWave(b)) return None
    // Long cursor for the same hostile-size reason as parseWavHeader.
    var pos = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val p = pos.toInt
      val id = new String(b, p, 4, "US-ASCII")
      val size = le32(b, p + 4) // unsigned 32-bit, always in [0, 2^32)
      if (id == "fmt ") {
        if (size < 16 || pos + 8 + 16 > b.length) return None
        val channels = le16(b, p + 10)
        val rate = le32(b, p + 12)
        val bits = le16(b, p + 22)
        if (!(channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0))
          return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (id == "data") {
        if (pos + 8 + size > b.length) return None // truncated
        data = Some((p + 8, size.toInt))
      }
      pos += 8L + size + (size & 1L)
    }
    for ((r, c, bt) <- fmt; (off, len) <- data) yield (r, c, bt, off, len)
  }
}

/** STUB codec layer — deterministic fakes standing in for image/audio
  * libraries unavailable in this environment. Every output is a pure
  * function of the input bytes, so tests are reproducible. */
object StubCodecs {

  /** STUB decode: dims derived from a hash of the leading bytes (a real
    * impl would parse the codec header / hand off to a decoder). */
  def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    val lim = math.min(bytes.length, 16)
    while (i < lim) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + (math.abs(h) % 1024).toInt
    val hgt = 16 + (math.abs(h >> 10) % 1024).toInt
    ((w, hgt, 3))
  }

  /** STUB embedding: bytes folded into a deterministic unit-ish vector. */
  def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      acc(d) += ((bytes(i) & 0xFF) - 127.5f) / 127.5f
      i += 1
    }
    val norm = math.sqrt(acc.map(x => x * x).sum).toFloat max 1e-6f
    acc.map(_ / norm)
  }
}
