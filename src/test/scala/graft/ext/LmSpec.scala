package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the bigram-LM quality scorer (x45). */
class LmSpec extends SparkSpec {
  import spark.implicits._

  // train corpus "a b a b a c": C1 = {a:3, b:2, c:1}, T = 6,
  // C2 = {(a,b):2, (b,a):2, (a,c):1}
  private def train = Seq((100L, "a b a b a c")).toDF("doc_id", "text")

  test("bigramLmScoreQ30: exact seen, backoff, and OOV scores") {
    val cand = Seq(
      (1L, "a b"),   // seen pair: floor(2^30·2/3)           = 715827882
      (2L, "c a"),   // unseen pair, seen w2: floor(2^30·4·3/60) = 214748364
      (3L, "z q"),   // both unseen: 0
      (4L, "a"),     // one token: no pairs
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextStats.bigramLmScoreQ30(cand, "text", "doc_id", train, "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(out.sameElements(Array(
      (1L, 1L, Some(715827882L), Some(715827882L)),
      (2L, 1L, Some(214748364L), Some(214748364L)),
      (3L, 1L, Some(0L), Some(0L)),
      (4L, 0L, None, None),
      (5L, 0L, None, None))), out.toSeq)
  }

  test("bigramLmScoreQ30: in-distribution text outscores shuffled garbage") {
    val cand = Seq(
      (1L, "a b a b"),  // exactly the training distribution
      (2L, "b b b b")   // never-seen transitions, backoff only
    ).toDF("doc_id", "text")
    val out = TextStats.bigramLmScoreQ30(cand, "text", "doc_id", train, "text")
      .select("doc_id", "lm_q30").as[(Long, Long)].collect().toMap
    assert(out(1L) > out(2L), out)
  }

  test("bigramLmScoreQ30: empty train corpus scores 0, no ANSI throw") {
    val cand = Seq((1L, "a b")).toDF("doc_id", "text")
    val out = TextStats.bigramLmScoreQ30(
      cand, "text", "doc_id", train.filter(col("doc_id") < 0), "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(out.sameElements(Array((1L, 1L, Some(0L), Some(0L)))), out.toSeq)
  }

  test("bigramLmScoreQ30 rejects reserved score-side columns") {
    val bad = Seq((1L, "a b", 0L)).toDF("doc_id", "text", "_c2")
    val e = intercept[IllegalArgumentException] {
      TextStats.bigramLmScoreQ30(bad, "text", "doc_id", train, "text")
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("kneserNeyBigramScoreQ30: hand-computed discount + continuation interpolation") {
    // train bigrams: (a,b)x2, (a,c)x1, (c,b)x1 -> nbt 3;
    // ctx: a (c1x 3, n1l 2), c (1, 1); cont-right: b 2, c 1.
    // P(b|a) = (2-3/4)/3 + (3/4)(2/3)(2/3) = 3/4 -> 805306368
    // P(c|b): context b UNSEEN -> pure continuation 1/3 -> 357913941
    // P(a,a): seen context, unseen pair, cont(a)=0 -> 0
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "c b"))
      .toDF("doc_id", "text")
    val score = Seq((10L, "a b c b"), (11L, "x"), (12L, "a a"))
      .toDF("doc_id", "text")
    val got = TextStats.kneserNeyBigramScoreQ30(score, "text", "doc_id",
        train, "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .sortBy(_._1).toSeq
    val pBA = 805306368L           // floor(2^30 * 27/36)
    val pCb = 357913941L           // floor(2^30 * 1/3)
    val pBC = 805306368L           // floor(2^30 * 9/12) — P(b|c)
    assert(got == Seq(
      (10L, 3L, Some(pBA + pCb + pBC), Some((pBA + pCb + pBC) / 3)),
      (11L, 0L, None, None),
      (12L, 1L, Some(0L), Some(0L))), got.mkString(", "))
    // the KN signal vs stupid backoff: under x45's backoff an unseen pair
    // with a FREQUENT second word scores high regardless of context
    // diversity; KN scores by distinct-context count. Here "b" follows
    // two distinct contexts but "c" only one, so KN's continuation ranks
    // unseen->b above unseen->c exactly 2:1
    val contB = 715827882L         // floor(2^30 * 2/3)
    val kn = TextStats.kneserNeyBigramScoreQ30(
      Seq((20L, "zz b"), (21L, "zz c")).toDF("doc_id", "text"),
      "text", "doc_id", train, "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(kn(0)._3 == Some(contB) && kn(1)._3 == Some(pCb),
      kn.mkString(", "))
    // empty train: every pair 0, no ANSI throw
    val empty = TextStats.kneserNeyBigramScoreQ30(score, "text", "doc_id",
      train.filter(col("doc_id") < 0), "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(empty.head == ((10L, 3L, Some(0L), Some(0L))), empty.mkString(", "))
    // reserved-name guard
    val e = intercept[IllegalArgumentException] {
      TextStats.kneserNeyBigramScoreQ30(
        score.withColumnRenamed("doc_id", "_w1"), "text", "_w1", train, "text")
    }
    assert(e.getMessage.contains("reserves"))
  }
}
