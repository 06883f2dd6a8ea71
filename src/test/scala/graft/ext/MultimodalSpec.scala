package graft.ext

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq(
      (1L, "fake-png-bytes-of-image-one".getBytes),
      (2L, "fake-png-bytes-of-image-two".getBytes),
      (3L, Array.emptyByteArray),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "bytes"), "id", "bytes", "png")

  test("asMedia produces the canonical schema with metadata") {
    assert(media.schema == Multimodal.mediaSchema)
    val meta = media.orderBy("media_id").select("meta.n_bytes").as[Long].collect()
    assert(meta.sameElements(Array(27L, 27L, 0L, 0L)))
  }

  test("decodeImages: corrupt/null rows quarantined (ok=false), not failed") {
    val out = Multimodal.decodeImages(media, batchSize = 2)
      .collect().sortBy(_.mediaId)
    assert(out.length == 4)
    assert(out.count(_.ok) == 2)
    assert(out.filter(_.ok).forall(i => i.width >= 16 && i.height >= 16))
    // deterministic: same bytes -> same dims
    val again = Multimodal.decodeImages(media).collect().sortBy(_.mediaId)
    assert(out.map(i => (i.width, i.height)).sameElements(again.map(i => (i.width, i.height))))
  }

  test("decodeImages parses real PNM headers; malformed bytes quarantine") {
    def ppm(header: String, rasterBytes: Int): Array[Byte] =
      header.getBytes("US-ASCII") ++ Array.fill(rasterBytes)(7.toByte)
    val imgs = Multimodal.asMedia(Seq(
      (1L, ppm("P6\n2 3\n255\n", 2 * 3 * 3)),          // valid RGB 2x3
      (2L, ppm("P5\n# a comment\n4 1\n255\n", 4)),     // valid gray w/ comment
      (3L, ppm("P6\n2 3\n255\n", 5)),                  // truncated raster
      (4L, ppm("P6\n0 3\n255\n", 9)),                  // zero width
      (5L, ppm("P6\n2 3\n99999\n", 18)),               // maxval out of range
      (6L, ppm("P6\nxy\n255\n", 18))                   // dims not numeric
    ).toDF("id", "bytes"), "id", "bytes", "image/x-portable-anymap")
    val out = Multimodal.decodeImages(imgs, batchSize = 2)
      .collect().sortBy(_.mediaId)
    assert(out.map(_.ok).sameElements(Array(true, true, false, false, false, false)))
    assert((out(0).width, out(0).height, out(0).channels) == ((2, 3, 3)))
    assert((out(1).width, out(1).height, out(1).channels) == ((4, 1, 1)))
    // 16-bit samples need a double-size raster: truncated at 1 byte/sample
    assert(Multimodal.decodeImages(Multimodal.asMedia(
      Seq((7L, ppm("P5\n2 2\n65535\n", 4))).toDF("id", "bytes"),
      "id", "bytes", "pgm")).head().ok == false)
  }

  test("decodeAudio parses real WAV RIFF headers; malformed bytes quarantine") {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def wav(channels: Int, rate: Int, bits: Int): Array[Byte] =
      "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
        le32(rate * channels * bits / 8) ++ le16(channels * bits / 8) ++ le16(bits) ++
        "data".getBytes ++ le32(0)
    val good = wav(2, 44100, 16)
    val audio = Multimodal.asMedia(Seq(
      (1L, good),
      (2L, wav(1, 8000, 8)),
      (3L, "RIFX".getBytes ++ good.drop(4)),  // bad RIFF magic
      (4L, good.take(20)),                    // truncated fmt chunk
      (5L, wav(0, 44100, 16)),                // zero channels
      (6L, "not audio at all".getBytes)
    ).toDF("id", "bytes"), "id", "bytes", "audio/wav")
    val out = Multimodal.decodeAudio(audio, batchSize = 3)
      .collect().sortBy(_.mediaId)
    assert(out.map(_.ok).sameElements(Array(true, true, false, false, false, false)))
    assert((out(0).sampleRate, out(0).channels, out(0).bitsPerSample) == ((44100, 2, 16)))
    assert((out(1).sampleRate, out(1).channels, out(1).bitsPerSample) == ((8000, 1, 8)))
  }

  test("extractFeatures: fixed-dim unit vectors feed the similarity ops") {
    val feats = Multimodal.extractFeatures(media, dim = 8).toDF()
      .withColumnRenamed("mediaId", "vec_id")
      .withColumnRenamed("feature", "embedding")
    val top = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") === 1),
      "vec_id", "embedding", 1, Similarity.dot)
    assert(top.select("n_id").as[Long].head() == 2L) // other real image is nearest
  }

  test("sampleFrameIndexes strides over frame counts") {
    val vids = Seq((1L, 10), (2L, 1)).toDF("media_id", "n_frames")
    val idx = Multimodal.sampleFrameIndexes(vids, "n_frames", 4)
      .groupBy("media_id").agg(collect_list("frame_idx").as("idxs"))
      .orderBy("media_id").select("idxs").as[Seq[Int]].collect()
    assert(idx(0) == Seq(0, 4, 8))
    assert(idx(1) == Seq(0))
  }

  test("all native expressions are callable from SQL") {
    GraftFunctions.register(spark)
    Seq((1L, "abcdefghij", Array(1.0f, 2.0f), Array(3.0f, 4.0f), "['a', 'b']"))
      .toDF("id", "text", "va", "vb", "pylist")
      .createOrReplaceTempView("native_fns")
    val r = spark.sql(
      """SELECT md5_minhash_sig(text, 4, 5) AS mh, dot_q30(va, vb) AS d,
                py_literal_list(pylist) AS pl FROM native_fns""").head()
    assert(r.getSeq[String](r.fieldIndex("mh")).length == 4)
    assert(math.abs(r.getAs[Double]("d") - 11.0) < 1e-6) // 1*3 + 2*4
    assert(r.getSeq[String](r.fieldIndex("pl")).toSeq == Seq("a", "b"))
  }

  test("minhash_sig native expression: registered SQL + column API agree") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zzzzzzzzzz"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(text, 4, 5) AS sig FROM mh_docs ORDER BY doc_id")
      .select("sig").as[Seq[Long]].collect()
    val viaCol = df.orderBy("doc_id")
      .select(GraftFunctions.minhashSig(col("text"), 4, 5)).as[Seq[Long]].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(0) == viaSql(1)) // identical text => identical signature
    assert(viaSql(0) != viaSql(2))
    val fast = Dedup.minhashSignatureFast(df, "text", 4)
    assert(fast.columns.sameElements(Array("doc_id", "h1", "h2", "h3", "h4")))
    val pairs = Dedup.lshCandidatePairs(
      Dedup.minhashSignatureFast(df, "text", 4), "doc_id", 4, 2)
      .as[(Long, Long)].collect()
    assert(pairs.sameElements(Array((1L, 2L))))
  }

  test("pnmBlob/wavBlob columns round-trip through the real header parsers") {
    // the blob builders are pure column expressions; the decoders are the
    // imperative spec parsers — agreement means both match the format spec
    val df = Seq((1L, 7, 3, 16000L, 2L, 16L), (2L, 31, 17, 11000L, 1L, 8L))
      .toDF("id", "w", "h", "rate", "ch", "bits")
      .withColumn("png", Multimodal.pnmBlob(col("w"), col("h"), col("w") * col("h")))
      .withColumn("wav", Multimodal.wavBlob(col("rate"), col("ch"), col("bits")))
    val img = Multimodal.decodeImages(Multimodal.asMedia(df, "id", "png", "image/x-pnm"))
      .collect().sortBy(_.mediaId)
    assert(img.map(i => (i.width, i.height, i.channels, i.ok)).sameElements(
      Array((7, 3, 1, true), (31, 17, 1, true))))
    val aud = Multimodal.decodeAudio(Multimodal.asMedia(df, "id", "wav", "audio/wav"))
      .collect().sortBy(_.mediaId)
    assert(aud.map(a => (a.sampleRate, a.channels, a.bitsPerSample, a.ok)).sameElements(
      Array((16000, 2, 16, true), (11000, 1, 8, true))))
  }

  test("imageRasterStats: real P5/P6 pixel decode, unsigned bytes, truncation and 16-bit quarantine") {
    // hand-built rasters, including bytes above 127 (the signed-byte trap)
    def p5(w: Int, h: Int, px: Seq[Int]): Array[Byte] =
      (s"P5\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
        px.map(_.toByte)).toArray
    val p6 = (s"P6\n1 2\n255\n".getBytes("US-ASCII").toSeq ++
      Seq(10, 200, 30, 0, 255, 128).map(_.toByte)).toArray
    val p5deep = "P5\n2 1\n65535\n  ".getBytes("ISO-8859-1")
    val rows = Seq(
      (1L, p5(2, 2, Seq(0, 130, 255, 17))),       // sum 402, min 0, max 255
      (2L, p5(2, 2, Seq(1, 2, 3))),               // truncated → quarantine
      (3L, p6),                                    // P6: 6 samples
      (4L, p5deep),                                // 16-bit maxval → quarantine
      (5L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "b")
    val got = Multimodal.imageRasterStats(
      Multimodal.asMedia(rows, "doc_id", "b", "pnm"))
      .collect().map(r => r.mediaId -> r).toMap
    assert(got(1L) == Multimodal.RasterStats(1L, 4L, 402L, 0L, 255L, ok = true))
    assert(!got(2L).ok && got(2L).nPx == 0L)
    assert(got(3L) == Multimodal.RasterStats(3L, 6L, 623L, 0L, 255L, ok = true))
    assert(!got(4L).ok, "16-bit rasters are out of the 1-byte decoder's scope")
    assert(!got(5L).ok)
  }

  test("pnmPatternBlob raster replays the (seed + i) mod 256 formula through the decoder") {
    val df = Seq((300L, 3, 2), (7L, 2, 2)).toDF("seed", "w", "h")
      .withColumn("b", Multimodal.pnmPatternBlob(col("w"), col("h"),
        col("seed"), col("w") * col("h")))
    val got = Multimodal.imageRasterStats(
      Multimodal.asMedia(df, "seed", "b", "pnm"))
      .collect().map(r => r.mediaId -> r).toMap
    // seed 300: pixels (300+i)%256 for i<6 = 44..49 → sum 279
    assert(got(300L) == Multimodal.RasterStats(300L, 6L, 279L, 44L, 49L, ok = true))
    // seed 7: 7,8,9,10 → sum 34
    assert(got(7L) == Multimodal.RasterStats(7L, 4L, 34L, 7L, 10L, ok = true))
    // zero-length raster guard: no descending-sequence blow-up, clean quarantine
    val z = Seq((1L, 1, 1)).toDF("seed", "w", "h")
      .withColumn("b", Multimodal.pnmPatternBlob(col("w"), col("h"),
        col("seed"), lit(0)))
    assert(!Multimodal.imageRasterStats(
      Multimodal.asMedia(z, "seed", "b", "pnm")).head().ok)
  }

  test("imageAHash8 + ahashNearDup: hand-computed bands, 1-bit near pair, inverted no-candidate, quarantine") {
    def p5(w: Int, h: Int, px: Seq[Int]): Array[Byte] =
      (s"P5\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
        px.map(_.toByte)).toArray
    // 8x8 rasters: every pixel IS its own sample (idx = b), so bands
    // are hand-checkable. A: top half 200, bottom 10 -> mean 105,
    // bits 0..31 set -> bands (65535, 65535, 0, 0). B = A. C flips
    // sample 0 to 10 -> mean 102, bit 0 drops -> (65534, 65535, 0, 0),
    // Hamming(A, C) = 1 and they share band j = 1. D is A inverted ->
    // (0, 0, 65535, 65535): Hamming 64, shares NO band -> never a
    // candidate. E truncated -> quarantined, hashes nothing.
    val top = Seq.fill(32)(200) ++ Seq.fill(32)(10)
    val rows = Seq(
      (1L, p5(8, 8, top)),
      (2L, p5(8, 8, top)),
      (3L, p5(8, 8, Seq(10) ++ top.tail)),
      (4L, p5(8, 8, Seq.fill(32)(10) ++ Seq.fill(32)(200))),
      (5L, p5(8, 8, top.tail))).toDF("doc_id", "b")
    val hashes = Multimodal.imageAHash8(
      Multimodal.asMedia(rows, "doc_id", "b", "pnm"))
    val hm = hashes.collect().map(h => h.mediaId -> h).toMap
    assert(hm(1L) == Multimodal.AHash(1L, 65535L, 65535L, 0L, 0L, ok = true))
    assert(hm(3L) == Multimodal.AHash(3L, 65534L, 65535L, 0L, 0L, ok = true))
    assert(hm(4L) == Multimodal.AHash(4L, 0L, 0L, 65535L, 65535L, ok = true))
    assert(!hm(5L).ok)
    val pairs = Multimodal.ahashNearDup(hashes.toDF(), 3)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(pairs == Seq((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)),
      pairs.toString)
    // the 8x8 grid downsamples larger images by nearest-neighbor index
    // mapping: replay the engine's idx = (by*h/8)*w + (bx*w/8) on a
    // 16x16 seeded pattern against the hash computed by hand
    val big = Seq((9L, 16, 16)).toDF("seed", "w", "h")
      .withColumn("b", Multimodal.pnmPatternBlob(col("w"), col("h"),
        col("seed"), lit(256)))
    val bh = Multimodal.imageAHash8(
      Multimodal.asMedia(big, "seed", "b", "pnm")).collect().head
    val samples = (0 until 64).map(b => (9L + (b / 8) * 32 + (b % 8) * 2) % 256)
    val mean = samples.sum / 64
    val want = (0 to 3).map(j => (0 until 16).map(i =>
      if (samples(j * 16 + i) > mean) 1L << i else 0L).sum)
    assert(bh == Multimodal.AHash(9L, want(0), want(1), want(2), want(3),
      ok = true), s"$bh vs $want")
    intercept[IllegalArgumentException] {
      Multimodal.ahashNearDup(hashes.toDF(), 8)
    }
  }

  test("audioPcmStats + wavPatternBlob: signed LE16 decode replays the seeded formula; truncation/odd/missing-data quarantine") {
    // seed 32760, 4 samples: u16 = 32760..32763 -> signed -32776+...:
    // 32760..32763 >= 32768? no (32763 < 32768) -> all positive. Use a
    // seed that CROSSES the sign boundary: 32766, n=4 -> u 32766,
    // 32767, 32768, 32769 -> signed 32766, 32767, -32768, -32767:
    // sum = -2, min = -32768, max = 32767 — the full signed range.
    val df = Seq((32766L, 4L)).toDF("seed", "n")
      .withColumn("b", Multimodal.wavPatternBlob(lit(8000), lit(1),
        col("seed"), col("n"), col("n") * 2))
    val got = Multimodal.audioPcmStats(
      Multimodal.asMedia(df, "seed", "b", "wav")).collect().head
    assert(got == Multimodal.PcmStats(32766L, 4L, -2L, -32768L, 32767L,
      ok = true), got.toString)
    // one byte short of the declared data size -> truncated -> quarantine
    val cut = Seq((7L, 4L)).toDF("seed", "n")
      .withColumn("b", Multimodal.wavPatternBlob(lit(8000), lit(1),
        col("seed"), col("n"), col("n") * 2 - 1))
    assert(!Multimodal.audioPcmStats(
      Multimodal.asMedia(cut, "seed", "b", "wav")).collect().head.ok)
    // a header-only blob (no data chunk at all) quarantines
    val hdr = Seq((1L, 0L)).toDF("seed", "n")
      .withColumn("b", Multimodal.wavBlob(lit(8000), lit(1), lit(16)))
    assert(!Multimodal.audioPcmStats(
      Multimodal.asMedia(hdr, "seed", "b", "wav")).collect().head.ok)
    // an EMPTY data chunk is legal: 0 samples, identity sentinels
    val empty = Seq((1L, 0L)).toDF("seed", "n")
      .withColumn("b", Multimodal.wavPatternBlob(lit(8000), lit(1),
        col("seed"), col("n"), lit(0)))
    val e = Multimodal.audioPcmStats(
      Multimodal.asMedia(empty, "seed", "b", "wav")).collect().head
    assert(e == Multimodal.PcmStats(1L, 0L, 0L, 32767L, -32768L, ok = true),
      e.toString)
    // parseWavData finds data after skipped chunks and validates length
    val manual = ("RIFF".getBytes("US-ASCII") ++ Array[Byte](40, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 9, 9) ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      Array[Byte](1, 0, 1, 0) ++ Array[Byte](64, 31, 0, 0) ++
      Array[Byte](-128, 62, 0, 0) ++ Array[Byte](2, 0, 16, 0) ++
      "data".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0) ++
      Array[Byte](5, 0))
    val parsed = HeaderCodecs.parseWavData(manual)
    assert(parsed.exists { case (r, c, b2, off, len) =>
      r == 8000 && c == 1 && b2 == 16 && len == 2 &&
        manual(off) == 5 }, parsed.toString)
  }

  test("parseWavHeader walks past non-fmt chunks (LIST before fmt) and pads odd sizes") {
    // real WAVs often carry LIST/INFO chunks ahead of fmt; the walker must
    // skip them — including the 16-bit alignment pad after an odd size
    def le32(n: Long): Array[Byte] =
      Array(n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF, (n >> 24) & 0xFF).map(_.toByte)
    def le16(n: Int): Array[Byte] = Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte)
    val listBody = Array[Byte](73, 78, 70, 79, 0) // "INFO" + 1 byte => odd size 5
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(22050) ++ le32(22050 * 2 * 2) ++ le16(4) ++ le16(16)
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + 6 + fmt.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(listBody.length) ++ listBody ++
      Array[Byte](0) ++ // alignment pad for the odd LIST size
      fmt
    assert(HeaderCodecs.parseWavHeader(wav).contains((22050, 2, 16)))
    // and a file whose chunks never include fmt quarantines
    val noFmt = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + 6) ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(listBody.length) ++ listBody ++ Array[Byte](0)
    assert(HeaderCodecs.parseWavHeader(noFmt).isEmpty)
  }

  test("hostile near-2^31 chunk size quarantines instead of crashing the walker") {
    // a crafted chunk declaring size 0x7FFFFFF0 passes any <= Int.MaxValue
    // bound but overflows an Int cursor (12 + 8 + size wraps negative),
    // which used to throw out of new String instead of returning None —
    // one hostile blob failing the whole job. The Long-cursor walker must
    // fall out of the loop and quarantine.
    def le32(n: Long): Array[Byte] =
      Array(n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF, (n >> 24) & 0xFF)
        .map(_.toByte)
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(0x7FFFFFF0L) ++
      Array.fill[Byte](16)(0)
    assert(HeaderCodecs.parseWavHeader(evil).isEmpty)
    assert(HeaderCodecs.parseWavData(evil).isEmpty)
    // and a full-2^32-range size (unsigned) likewise
    val evil2 = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(0xFFFFFFF0L) ++
      Array.fill[Byte](16)(0)
    assert(HeaderCodecs.parseWavHeader(evil2).isEmpty)
    assert(HeaderCodecs.parseWavData(evil2).isEmpty)
    // through the batch decoder: ok=false row, no task failure
    val df = Seq((1L, evil)).toDF("id", "b")
    assert(!Multimodal.decodeAudio(
      Multimodal.asMedia(df, "id", "b", "wav")).head().ok)
  }

  test("mediaStats sniffs kind per blob and dispatches to the real decoders") {
    val img = Seq((10L, 3, 2)).toDF("id", "w", "h")
      .withColumn("b", Multimodal.pnmPatternBlob(col("w"), col("h"),
        lit(5L), lit(6L))).select(col("id"), col("b"))
    val imgCut = Seq((11L, 3, 2)).toDF("id", "w", "h")
      .withColumn("b", Multimodal.pnmPatternBlob(col("w"), col("h"),
        lit(5L), lit(5L))).select(col("id"), col("b"))
    val wav = Seq((12L, 4L)).toDF("id", "n")
      .withColumn("b", Multimodal.wavPatternBlob(lit(8000), lit(1),
        lit(32766L), col("n"), col("n") * 2)).select(col("id"), col("b"))
    val wavCut = Seq((13L, 4L)).toDF("id", "n")
      .withColumn("b", Multimodal.wavPatternBlob(lit(8000), lit(1),
        lit(7L), col("n"), col("n") * 2 - 1)).select(col("id"), col("b"))
    val junk = Seq((14L, Array[Byte](1, 2, 3, 4, 5)),
      (15L, null.asInstanceOf[Array[Byte]]),
      // a 2-byte PNM magic is a SNIFFABLE container: it must quarantine
      // under kind "image" (the imageRasterStats classification), not
      // fall to "unknown" on a length guard the sniff never sees
      (16L, "P5".getBytes("US-ASCII")),
      (17L, Array[Byte]('P'.toByte))).toDF("id", "b")
    val all = img.union(imgCut).union(wav).union(wavCut).union(junk)
    val got = Multimodal.mediaStats(Multimodal.asMedia(all, "id", "b", "mixed"))
      .collect().map(m => m.mediaId -> m).toMap
    // seed-5 6-px raster: 5,6,7,8,9,10 → sum 45
    assert(got(10L) == Multimodal.MediaStats(10L, "image", 6L, 45L, 5L, 10L,
      ok = true), got(10L).toString)
    // seed-32766 4 samples cross the sign boundary: sum −2, full range
    assert(got(12L) == Multimodal.MediaStats(12L, "audio", 4L, -2L, -32768L,
      32767L, ok = true), got(12L).toString)
    // truncated payloads quarantine under their SNIFFED kind
    assert(got(11L) == Multimodal.MediaStats(11L, "image", 0L, 0L, 0L, 0L,
      ok = false))
    assert(got(13L) == Multimodal.MediaStats(13L, "audio", 0L, 0L, 0L, 0L,
      ok = false))
    // unrecognized / null bytes are kind-unknown quarantine
    assert(got(14L).kind == "unknown" && !got(14L).ok)
    assert(got(15L).kind == "unknown" && !got(15L).ok)
    // bare "P5" magic: recognized container, truncated payload — image
    assert(got(16L) == Multimodal.MediaStats(16L, "image", 0L, 0L, 0L, 0L,
      ok = false))
    // a single byte sniffs as nothing
    assert(got(17L).kind == "unknown" && !got(17L).ok)
  }

  test("pnmBlob/wavBlob corruption knobs quarantine (truncated raster, bad magic)") {
    val df = Seq((1L, 5, 4)).toDF("id", "w", "h")
      .withColumn("png", Multimodal.pnmBlob(col("w"), col("h"),
        col("w") * col("h") - 1)) // one raster byte short
      .withColumn("wav", Multimodal.wavBlob(lit(8000L), lit(1L), lit(16L),
        magic = lit("RIFX")))
    assert(!Multimodal.decodeImages(
      Multimodal.asMedia(df, "id", "png", "image/x-pnm")).head().ok)
    assert(!Multimodal.decodeAudio(
      Multimodal.asMedia(df, "id", "wav", "audio/wav")).head().ok)
  }
}
