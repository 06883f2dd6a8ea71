package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good = "a perfectly reasonable document with more than ten whole tokens present here"

  private val docs = Seq(
    (1L, good, "en"),
    (2L, good, "en"), // exact dup of 1 -> 'dup' (higher id loses)
    (3L, "short text only", "en"), // < 10 tokens
    (4L, good + " variant", "xx"), // lang not allowed
    (5L, "!! ?? !! ?? !! ?? !! ?? !! ?? !! ??", "en"), // punct-heavy
    (6L, good + " another fine variant of the same document", "de")
  ).toDF("doc_id", "text", "lang")

  private val rules = Curation.Rules(minTokens = 10, allowedLangs = Seq("en", "de"))

  test("curate labels each document with the first failing rule") {
    val out = Curation.curate(docs, "text", "doc_id", "lang", rules)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ok", 2L -> "dup", 3L -> "too_short",
      4L -> "bad_lang", 5L -> "low_quality", 6L -> "ok"))
  }

  test("curateSplit partitions and report aggregates") {
    val (kept, rejected) = Curation.curateSplit(docs, "text", "doc_id", "lang", rules)
    assert(kept.select("doc_id").as[Long].collect().sorted.sameElements(Array(1L, 6L)))
    assert(rejected.count() == 4)
    val rep = Curation.report(Curation.curate(docs, "text", "doc_id", "lang", rules))
      .as[(String, Long)].collect().toMap
    assert(rep == Map("ok" -> 2L, "dup" -> 1L, "too_short" -> 1L,
      "bad_lang" -> 1L, "low_quality" -> 1L))
  }
}
