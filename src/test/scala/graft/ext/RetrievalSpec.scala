package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the sparse-retrieval (BM25) family. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle join join join"),   // tf-heavy on a common term
    (2L, "spark broadcast join"),           // both query terms, short doc
    (3L, "broadcast variable lore"),        // rare-term doc
    (4L, "spark spark spark spark spark spark spark spark"), // long, one term
    (5L, "unrelated words only here")
  ).toDF("doc_id", "text")

  test("packedId packs in-range children and raises loudly on the bound") {
    val df = Seq((7L, 0L), (7L, 99999L), (8L, 42L)).toDF("d", "c")
    val ok = df.select(Retrieval.packedId(col("d"), col("c"), 100000L).as("pid"))
      .as[Long].collect().toSet
    assert(ok == Set(700000L, 799999L, 800042L), ok.toString)
    // chunk_id == mult would silently collide into doc 8's key space —
    // the x72 failure mode — and must raise instead
    val bad = Seq((7L, 100000L)).toDF("d", "c")
    val e = intercept[Exception] {
      bad.select(Retrieval.packedId(col("d"), col("c"), 100000L)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("packedId"),
      String.valueOf(e.getMessage))
    // negative children are equally out of contract
    intercept[Exception] {
      Seq((7L, -1L)).toDF("d", "c")
        .select(Retrieval.packedId(col("d"), col("c"), 100000L)).collect()
    }
  }

  test("bm25TopK: conjunctive match outranks partial; rare terms outweigh common") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
      Seq(1L -> "spark broadcast"), 5)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    // doc 2 holds BOTH terms → must rank first; docs 3 (rare 'broadcast')
    // and 1/4 ('spark' only) follow; doc 5 matches nothing.
    assert(out.head._2 == 2L, out.toSeq)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L), out.toSeq)
    // 'broadcast' (df=2) must contribute more than 'spark' (df=3) at equal
    // tf: doc 3 (broadcast only) outscores doc 1 (spark, tf-saturated).
    val byDoc = out.map(r => r._2 -> r._3).toMap
    assert(byDoc(3L) > byDoc(1L), byDoc)
    // scores are positive and ranks contiguous from 1
    assert(out.forall(_._3 > 0) && out.map(_._4).toSeq == (1 to out.length))
  }

  test("bm25TopK: tf saturation — k1 caps repeated-term gains sublinearly") {
    // doc 4 has tf=8 of 'spark' vs doc 2's tf=1, but dl-normalization and
    // k1 saturation keep it under 8x; both dls differ so just pin ordering
    // doc4 > doc2-for-spark-only and the score ratio < tf ratio.
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
      Seq(1L -> "spark"), 5).as[(Long, Long, Long, Int)].collect()
    val byDoc = out.map(r => r._2 -> r._3).toMap
    assert(byDoc(4L) > byDoc(2L), byDoc)
    assert(byDoc(4L).toDouble / byDoc(2L) < 8.0, byDoc)
  }

  test("bm25TopK: k truncates per query and ties break to the lower doc id") {
    val tied = Seq(
      (10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(tied, "text", "doc_id",
      Seq(7L -> "alpha"), 2).orderBy("rank")
      .as[(Long, Long, Long, Int)].collect()
    // identical docs → identical scores → id-ascending, truncated at k=2
    assert(out.map(_._2).toSeq == Seq(10L, 11L), out.toSeq)
    assert(out(0)._3 == out(1)._3)
  }

  test("bm25TopKJoin rejects reserved columns on the query side") {
    val bad = Seq((1L, "x", 0L)).toDF("qid", "qtext", "tf")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKJoin(corpus, "text", "doc_id", bad, "qid", "qtext", 3)
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("indexed probe: bit-identical to the joined path on the same corpus") {
    val path = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", path)
    val qs = Seq(1L -> "spark broadcast", 2L -> "unrelated lore")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "doc_id", "score_q20", "rank")
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(rows(Retrieval.bm25TopKIndexed(path, qs, 3)) ==
      rows(Retrieval.bm25TopK(corpus, "text", "doc_id", qs, 3)))
  }

  test("incremental index: appended batches probe bit-identical to one-shot") {
    val path = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    val (b1, b2) = (corpus.filter(col("doc_id") <= 2), corpus.filter(col("doc_id") > 2))
    Retrieval.appendIndexBatch(b1, "text", "doc_id", path)
    Retrieval.appendIndexBatch(b2, "text", "doc_id", path)
    val qs = Seq(1L -> "spark broadcast", 2L -> "unrelated lore")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "doc_id", "score_q20", "rank")
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(rows(Retrieval.bm25TopKStaged(path, qs, 3)) ==
      rows(Retrieval.bm25TopK(corpus, "text", "doc_id", qs, 3)))
    // a third batch shifts df/avgdl corpus-wide: the staged probe must
    // track the union, not the first snapshot
    val b3 = Seq((9L, "spark spark lore")).toDF("doc_id", "text")
    Retrieval.appendIndexBatch(b3, "text", "doc_id", path)
    assert(rows(Retrieval.bm25TopKStaged(path, qs, 3)) ==
      rows(Retrieval.bm25TopK(corpus.unionAll(b3), "text", "doc_id", qs, 3)))
  }

  test("bm25 is blank-safe: token-less docs and blank queries contribute nothing") {
    val withBlank = corpus.union(Seq((6L, "   "), (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val out = Retrieval.bm25TopK(withBlank, "text", "doc_id",
      Seq(1L -> "spark", 2L -> "  "), 10).as[(Long, Long, Long, Int)].collect()
    assert(out.forall(r => r._1 == 1L), out.toSeq)          // blank query: no rows
    assert(!out.exists(r => r._2 == 6L || r._2 == 7L))       // blank docs never match
    // an EMPTY corpus must return empty, not ANSI-throw on avgdl's div
    val none = corpus.filter(col("doc_id") < 0)
    assert(Retrieval.bm25TopK(none, "text", "doc_id", Seq(1L -> "spark"), 3)
      .count() == 0)
  }

  test("bm25PrfTopK: feedback terms expand the query and surface unreachable docs") {
    // query 'apple' alone can never reach d2/d3 (no shared term); its
    // top feedback doc d1 donates 'banana' (apple itself excluded), and
    // the expanded query retrieves d2. d3 stays out (no query or
    // expansion term). kFb=1, mExp=1 makes the donation deterministic.
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry durian")
    ).toDF("doc_id", "text")
    val qs = Seq(1L -> "apple").toDF("qid", "qtext")
    val base = Retrieval.bm25TopKJoin(docs, "text", "doc_id",
      qs, "qid", "qtext", 5).select("doc_id").as[Long].collect().toSet
    assert(base == Set(1L), base.toString)
    val prf = Retrieval.bm25PrfTopK(docs, "text", "doc_id",
      qs, "qid", "qtext", 5, 1, 1)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(prf == Seq(1L, 2L), prf.toString)
    // original terms never re-donate: the expansion excluded 'apple', so
    // d1 still ranks first (it matches both apple AND banana)
  }

  test("bm25PrfTopK: expansion mines only feedback docs and respects mExp") {
    // two feedback docs donate terms; mExp=1 keeps only the heaviest
    // (summed tf, ties token-asc)
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "banana fig"),
      (4L, "cherry fig")
    ).toDF("doc_id", "text")
    val qs = Seq(1L -> "apple").toDF("qid", "qtext")
    // feedback = d1, d2 (the only apple docs); term masses: banana 2,
    // cherry 1 → banana expands; d3 (banana) enters, d4 (cherry) doesn't
    val prf = Retrieval.bm25PrfTopK(docs, "text", "doc_id",
      qs, "qid", "qtext", 5, 2, 1)
      .select("doc_id").as[Long].collect().toSet
    assert(prf == Set(1L, 2L, 3L), prf.toString)
  }

  test("rrfFuse: exact Q30 contributions, absent list = 0, ties to lower id") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "n_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 1L))
      .toDF("qid", "n_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "qid", "n_id", "rank",
        rrfK = 60, kOut = 10)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    def c(r: Long) = 1073741824L / (60L + r) // floor, rank > 0
    // 11 is in both lists and must fuse to the top; 10 and 13 tie at c(1)
    // and must break to the lower id; 12 trails at c(2)
    assert(out.map(r => (r._2, r._3)) == Seq(
      (11L, c(2) + c(1)), (10L, c(1)), (13L, c(1)), (12L, c(2))), out)
    assert(out.map(_._4) == Seq(1L, 2L, 3L, 4L), out)
    // kOut truncates
    assert(Retrieval.rrfFuse(Seq(a, b), "qid", "n_id", "rank", 60, 2)
      .count() == 2)
  }

  test("hardNegatives: per-query lexical-minus-dense, lexical columns kept") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 10L, 1L))
      .toDF("qid", "n_id", "rank")
    val dense = Seq((1L, 11L, 1L), (2L, 99L, 1L)).toDF("qid", "n_id", "rank")
    val out = Retrieval.hardNegatives(lex, dense, "qid", "n_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 11 is dense-accepted for q1 so it is NOT a hard negative there;
    // doc 10 is (for both queries — dense never surfaced it)
    assert(out == Seq((1L, 10L, 1L), (2L, 10L, 1L)), out)
  }

  test("containmentQrels + evalRun: hand-computed precision/recall/MRR") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c x"),
      (4L, "z z"), (5L, "b")).toDF("doc_id", "text")
    val queries = Seq(1L -> "a b", 2L -> "z", 3L -> "q")
    val qrels = Retrieval.containmentQrels(docs, "text", "doc_id", queries)
      .as[(Long, Long)].collect().toSet
    // "a b" → docs holding BOTH a and b; "z" → doc 4; "q" → nothing
    assert(qrels == Set((1L, 1L), (1L, 2L), (2L, 4L)))
    // hand-built run: q1 ranks (3, 1, 2) — first relevant at rank 2;
    // q2 hits at rank 1; q3 retrieves only an irrelevant doc
    val run = Seq(
      (1L, 3L, 1L), (1L, 1L, 2L), (1L, 2L, 3L),
      (2L, 4L, 1L),
      (3L, 5L, 1L)).toDF("qid", "doc_id", "rank")
    val got = Retrieval.evalRun(run,
        Retrieval.containmentQrels(docs, "text", "doc_id", queries), 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1048576L * 2 / 3, 1048576L, 524288L),
      (2L, 1L, 1L, 1048576L / 3, 1048576L, 1048576L),
      (3L, 0L, 0L, 0L, 0L, 0L)), got)
    // ranks beyond k are ignored: k = 1 sees only the rank-1 rows
    val at1 = Retrieval.evalRun(run,
        Retrieval.containmentQrels(docs, "text", "doc_id", queries), 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(at1.head == ((1L, 2L, 0L, 0L, 0L, 0L)), at1.head)
    assert(at1(1) == ((2L, 1L, 1L, 1048576L, 1048576L, 1048576L)), at1(1))
    intercept[IllegalArgumentException](Retrieval.evalRun(run, docs, 0))
    intercept[IllegalArgumentException](
      Retrieval.evalRun(run.drop("rank"), docs, 3))
  }
  test("evalNdcg: hand-computed NDCG@3, perfect-rank pin, n_rel clamp, guards") {
    val disc = Retrieval.ndcgDiscountsQ20(3)
    // anchor the shared constant table: log2(2) and log2(4) are exact
    // in IEEE double, so ranks 1 and 3 pin exactly; rank 2 sits in
    // (2^20/1.585, 2^20/1.5848) — a drifted log would leave the band
    assert(disc.head == 1048576L, disc.toString)
    assert(disc(2) == 524288L, disc.toString)
    assert(disc(1) > 661400L && disc(1) < 661700L, disc.toString)
    val cum = disc.scanLeft(0L)(_ + _).tail
    val qrels = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L), // q1: 3 relevant, one unranked
      (2L, 50L),                       // q2: run never finds it
      (3L, 30L),                       // q3: perfect single hit
      (5L, 70L), (5L, 71L), (5L, 72L), (5L, 73L) // q5: n_rel > k
    ).toDF("qid", "doc_id")
    val run = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 60L, 1L),
      (3L, 30L, 1L),
      (4L, 80L, 1L), // q4: no qrels at all
      (5L, 70L, 1L), (5L, 71L, 2L), (5L, 72L, 3L)
    ).toDF("qid", "doc_id", "rank")
    val got = Retrieval.evalNdcg(run, qrels, 3, disc)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // q1: dcg = d1+d3, idcg = cum(3) (all three relevant fit in k)
      (1L, 3L, disc(0) + disc(2), cum(2),
        1048576L * (disc(0) + disc(2)) / cum(2)),
      (2L, 1L, 0L, cum(0), 0L),
      (3L, 1L, disc(0), cum(0), 1048576L), // perfect ranking reads 2^20
      (4L, 0L, 0L, 0L, 0L),                // no qrels: the 0 convention
      // q5: idcg clamps to cum(min(4,3)); all 3 ranks hit -> 2^20
      (5L, 4L, cum(2), cum(2), 1048576L)), got.toString)
    intercept[IllegalArgumentException](
      Retrieval.evalNdcg(run, qrels, 2, disc)) // size mismatch
    intercept[IllegalArgumentException](
      Retrieval.evalNdcg(run, qrels, 3, Seq(1L, 2L, 3L))) // increasing
    intercept[IllegalArgumentException](
      Retrieval.evalNdcg(run, qrels, 3, Seq(3L, 2L, 0L))) // non-positive
    intercept[IllegalArgumentException](
      Retrieval.evalNdcg(run.drop("rank"), qrels, 3, disc))
    intercept[IllegalArgumentException](Retrieval.ndcgDiscountsQ20(0))
  }

  test("duplicate qrel rows don't fan out the join or inflate n_rel (evalRun + evalNdcg)") {
    // binary relevance is a SET: a doubled (qid, doc_id) row must change
    // NOTHING — without the internal dedup it double-counted the hit's
    // discount in dcg and inflated n_rel/idcg
    val disc = Retrieval.ndcgDiscountsQ20(3)
    val qrels = Seq((1L, 10L), (1L, 12L), (3L, 30L)).toDF("qid", "doc_id")
    val doubled = qrels.union(qrels)
    val run = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (3L, 30L, 1L)).toDF("qid", "doc_id", "rank")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("qid").collect().map(_.toSeq.toList).toSeq
    assert(rows(Retrieval.evalNdcg(run, doubled, 3, disc)) ==
      rows(Retrieval.evalNdcg(run, qrels, 3, disc)))
    assert(rows(Retrieval.evalRun(run, doubled, 3)) ==
      rows(Retrieval.evalRun(run, qrels, 3)))
    // and the distinct baseline itself is the hand-computed answer
    val q1 = Retrieval.evalNdcg(run, doubled, 3, disc)
      .filter(col("qid") === 1L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(q1._2 == 2L && q1._3 == disc(0) + disc(2), q1.toString)
  }
}
