package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Non-vacuous fixtures for the signature-gated exact-dedup compositions
  * (x2b/x3b): the sf corpora carry no exact duplicates, so their oracle
  * rows verify 0 == 0 — these fixtures feed the md5 regroup and the
  * md5-equality pair filter a corpus with REAL duplicate groups plus a
  * signature-colliding non-duplicate pair (identical 5-shingle sets,
  * different bytes), pinning the output against brute-force md5 grouping
  * (r15 ADVICE). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // a dup group of 3, a dup group of 2, a unique doc, and a pair whose
  // texts DIFFER but share one character-5-shingle set ("abcdeabcde" vs
  // "abcdeabcdeabcde": every window is a rotation of "abcde") — the
  // minhash signature collides while md5 does not, exactly the false
  // positive the md5 regroup / pair filter must reject
  private val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox jumps"),
    (3L, "the quick brown fox jumps"),
    (4L, "lorem ipsum dolor sit amet"),
    (5L, "lorem ipsum dolor sit amet"),
    (6L, "completely different words here"),
    (7L, "abcdeabcde"),
    (8L, "abcdeabcdeabcde"))

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_x2b_fix").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("fixture premise: 7/8 collide in fast signature but not in md5") {
    val d = docs.toDF("doc_id", "text")
    val sig = Dedup.minhashSignatureFast(d, "text", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getAs[Long])).toMap
    assert(sig(7L) == sig(8L), "5-shingle sets are equal — signatures must be")
    val h = d.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(7L) != h(8L))
  }

  test("x2b signature-gated exact dedup == brute-force md5 grouping") {
    val dir = fixtureDir()
    val got = graft.SparkEntry.queries("x2b_minhash_fast")(spark, dir)
      .orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSeq
    // brute force: md5-group the whole corpus, keep groups > 1
    val brute = Dedup.exactDedup(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .filter(col("n_dups") > 1).orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSeq
    assert(got == brute)
    assert(got == Seq((1L, 3L), (4L, 2L)),
      s"colliding-but-distinct 7/8 must not survive the md5 regroup: $got")
  }

  test("x3b LSH-fed exact pairs == md5-equal pairs; collider pair is cut") {
    val dir = fixtureDir()
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // the banded candidate source DOES surface the signature collision —
    // the fixture exercises the false-positive path, not just true dups
    val cands = Dedup.lshCandidatePairs(
        Dedup.minhashSignatureFast(d, "text", 4), "doc_id", 4, 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(cands.contains((7L, 8L)), s"collider pair missing from candidates: $cands")
    val got = graft.SparkEntry.queries("x3b_lsh_pairs_fast")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)), got.toString)
  }
}
