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
}
