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
}
