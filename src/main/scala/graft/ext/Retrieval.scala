package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over a document corpus: inverted-index
  * statistics and BM25 top-k search. The dense half of retrieval lives in
  * [[Similarity]] (brute-force / IVF / PQ ANN); this module is the other
  * half a training-data pipeline needs — term-based search for corpus
  * exploration, decontamination triage ("which documents mention this
  * benchmark?"), and targeted curation pulls.
  *
  * Cross-engine determinism: classic BM25's `ln`-based IDF is not
  * bit-stable across engines (libm vs java.lang.Math), so scoring uses a
  * RATIONAL-IDF BM25 variant computed entirely in exact integer
  * arithmetic:
  *
  *   idf(t)        = (N - df(t) + 1) / (df(t) + 1)            (monotone in df, as ln-idf is)
  *   tfNorm(t, d)  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   score(q, d)   = Σ_{t ∈ q} floor(2^20 · idf(t) · tfNorm(t, d))
  *
  * with k1 = 1.2 and b = 0.75 carried as the integer pair (K1=120, B=75)
  * over scale S=100, and avgdl carried as `A = (S·totalLen) div N`
  * (floor(100·avgdl) — both engines floor identically). Every product is
  * evaluated in decimal(38,0) (exact at any realistic corpus width: the
  * widest intermediate is 2^20·N·tf·22000·A ≈ 1e33 for a 1e11-document,
  * 1e5-token-cap corpus) and the single floor-division lands back in a
  * long (≤ 2^20·(k1+1)·N ≈ 2.3e17 at that scale). The DuckDB oracle
  * replays the same integers over HUGEINT.
  *
  * Scale shape: the inverted index is ONE (token, doc) shuffle with
  * map-side partial counts; a query batch is broadcast and hash-joined
  * against the postings (the postings side never re-shuffles for the
  * probe), candidate scores reduce on a (query, doc) key — candidates
  * only, never the corpus — and top-k is a per-query window over that
  * candidate-sized frame. Corpus-wide scalars (N, totalLen) ride the plan
  * as a broadcast single-row join.
  *
  * Reference provenance: the reference has no search operator; this is
  * beyond-reference surface motivated by its dictionary-exploration
  * scripts (e.g. dug_helpers/dug_utils.py's term lookups), re-expressed
  * as corpus-scale retrieval.
  */
object Retrieval {

  /** Pack a (parent id, child id) pair into ONE long key:
    * `parent·mult + child`, with a LOUD per-row bound check — `child`
    * must lie in [0, mult) or the row raises, because a silent
    * out-of-range child would COLLIDE into another parent's key space
    * (the x72 passage-id contract: a ≥ mult·stride-token document must
    * fail the job, never silently merge its passages into a neighboring
    * document's). ANSI mode already makes the multiply overflow-loud;
    * this makes the modulus assumption equally loud. Unpack with
    * `pid div mult` / `pid % mult`. */
  def packedId(parent: Column, child: Column, mult: Long): Column = {
    require(mult >= 2, "mult must be >= 2")
    when(child >= 0 && child < mult, parent * mult + child)
      .otherwise(raise_error(concat(
        lit(s"packedId: child id out of [0, $mult): "), child.cast("string"))))
  }

  /** Tokenized (id, tok) pairs: whitespace split of the trimmed text,
    * empty/blank-safe. Identical semantics to [[TextStats]]'s tokenizers
    * and the x34 vocabulary query. */
  def tokens(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(TextStats.wsTrim(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** Postings list: (tok, doc_id, tf). One shuffle on (tok, doc_id) with
    * map-side partial counts. */
  def postings(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokens(df, textCol, idCol)
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))

  /** Per-document length (whitespace token count) — zero-exchange
    * projection. Token-less docs keep dl = 0 and simply never match a
    * posting. */
  def docLengths(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextStats.tokenCount(col(textCol)).cast("long").as("dl"))

  /** Document frequency per term, from a postings frame. */
  def termDf(post: DataFrame): DataFrame =
    post.groupBy("tok").agg(count(lit(1)).as("tdf"))

  /** One exact integer term score. All products in decimal(38,0); the
    * single floor-div (IntegralDivide — exact, both engines floor the
    * same non-negative quotient) returns the long Q20 score. Shared by
    * the joined and the indexed probe (whose layout denormalizes the
    * same tdf/dl/_n/_a columns). */
  private val termScoreSql: String =
    """(1048576 * cast(_n - tdf + 1 as decimal(38,0)) * tf * 22000 * _a)
       div
       (cast(tdf + 1 as decimal(38,0)) * (tf * 10000 * _a + 120 * (25 * _a + 7500 * dl)))"""

  /** BM25 top-k search: for each (qid, qtext) query, the k highest-scoring
    * documents by the exact rational-idf BM25 above, ties broken by doc id
    * ascending. Returns (qid, doc_id, score_q20, rank).
    *
    * `queries` is a small literal batch (search is interactive-scale on
    * the query side); it is broadcast, so the corpus-side postings never
    * reshuffle for the probe. For a query WORKLOAD as data, see
    * [[bm25TopKJoin]]. */
  def bm25TopK(corpus: DataFrame, textCol: String, idCol: String,
               queries: Seq[(Long, String)], k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    bm25TopKJoin(corpus, textCol, idCol,
      queries.toDF("qid", "qtext"), "qid", "qtext", k)
  }

  /** Data-driven form of [[bm25TopK]]: queries arrive as a DataFrame
    * (qidCol, qtextCol). The query side is broadcast — the plan and the
    * corpus-side shuffle layout are independent of the number of queries
    * (the ivfAssignJoin lesson). Query terms are de-duplicated per query
    * (standard BM25 sums each distinct term once). */
  def bm25TopKJoin(corpus: DataFrame, textCol: String, idCol: String,
                   queries: DataFrame, qidCol: String, qtextCol: String,
                   k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val reserved = Seq("doc_id", "tok", "tf", "dl", "tdf", "qid",
      "_n", "_a", "score_q20", "rank")
    reserved.foreach { c =>
      require(!queries.columns.contains(c) || c == qidCol || c == qtextCol,
        s"bm25TopKJoin reserves column $c on the query side")
    }
    val parts = indexParts(corpus, textCol, idCol)
    rankScores(parts, queryTermsOf(queries, qidCol, qtextCol))
      .filter(col("rank") <= k)
  }

  /** The shared probe inputs: postings, doc lengths, term dfs, and the
    * corpus scalars as ONE broadcastable row. */
  private case class IndexParts(post: DataFrame, dls: DataFrame,
                                tdfs: DataFrame, stats: DataFrame)

  private def indexParts(corpus: DataFrame, textCol: String,
                         idCol: String): IndexParts = {
    val post = postings(corpus, textCol, idCol)
    val dls = docLengths(corpus, textCol, idCol)
    // Corpus scalars: N docs and A = floor(100*avgdl). The div is exact
    // integer floor (both operands non-negative). _n = 0 (empty corpus)
    // must not ANSI-throw on the div: the guard value never reaches
    // output (no postings -> no candidate rows)
    val stats = dls.agg(count(lit(1)).as("_n"), sum("dl").as("_tl"))
      .selectExpr("_n",
        "case when _n = 0 then 0L else (100 * cast(_tl as decimal(38,0))) div _n end as _a")
    IndexParts(post, dls, termDf(post), stats)
  }

  /** Distinct (qid, tok) query terms (standard BM25 sums each distinct
    * term once). */
  private def queryTermsOf(queries: DataFrame, qidCol: String,
                           qtextCol: String): DataFrame =
    queries
      .select(col(qidCol).as("qid"),
        explode(split(TextStats.wsTrim(col(qtextCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** Score candidates for a (qid, tok) term table and rank per query —
    * the probe shape both passes of [[bm25PrfTopK]] and the one-pass
    * searches share: term table broadcast, postings never reshuffle,
    * (qid, doc_id) reduce over candidates only. */
  private def rankScores(parts: IndexParts, qterms: DataFrame): DataFrame =
    parts.post
      .join(broadcast(qterms), "tok")
      .join(parts.dls, "doc_id")
      .join(parts.tdfs, "tok")
      .join(broadcast(parts.stats))
      .groupBy("qid", "doc_id")
      .agg(sum(expr(termScoreSql)).as("score_q20"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score_q20").desc, col("doc_id"))))

  /** BM25 with RM3-style pseudo-relevance feedback — the classic
    * two-pass expansion (Abdul-Jaleel et al. 2004's RM3, reduced to its
    * deterministic core): pass 1 retrieves each query's top `kFb`
    * feedback documents; the `mExp` heaviest terms across them (by
    * summed tf, ties token-ascending, the query's own terms excluded)
    * join the query; pass 2 rescores with the expanded term set —
    * uniform term weights, so every score stays the exact integer Q20
    * BM25 and the whole two-pass flow replays in the oracle.
    *
    * Scale shape: two broadcast probes of the SAME postings frame (the
    * corpus never reshuffles for either pass); the feedback set
    * (|Q|·kFb rows) broadcasts onto the postings by doc id for
    * expansion mining, whose aggregation is feedback-sized, not
    * corpus-sized. Returns pass-2's (qid, doc_id, score_q20, rank ≤ k). */
  def bm25PrfTopK(corpus: DataFrame, textCol: String, idCol: String,
                  queries: DataFrame, qidCol: String, qtextCol: String,
                  k: Int, kFb: Int, mExp: Int): DataFrame = {
    require(k > 0 && kFb > 0 && mExp > 0, "k, kFb, mExp must be positive")
    val parts = indexParts(corpus, textCol, idCol)
    val qt = queryTermsOf(queries, qidCol, qtextCol)
    val fb = rankScores(parts, qt).filter(col("rank") <= kFb)
      .select(col("qid"), col("doc_id"))
    val expTop = parts.post
      .join(broadcast(fb), "doc_id")
      .groupBy(col("qid"), col("tok"))
      .agg(sum(col("tf")).as("_fm"))
      .join(qt, Seq("qid", "tok"), "left_anti")
      .withColumn("_fr", row_number().over(
        Window.partitionBy("qid").orderBy(col("_fm").desc, col("tok"))))
      .filter(col("_fr") <= mExp)
      .select(col("qid"), col("tok"))
    rankScores(parts, qt.unionByName(expTop).distinct())
      .filter(col("rank") <= k)
  }

  /** Driver-side (qid, term) pairs and their distinct md5 buckets — the
    * same lowercase hex as Spark's md5(), computed BEFORE the plan so the
    * layout scan's bucket filter prunes statically. */
  private def queryTermsAndBuckets(queries: Seq[(Long, String)],
                                   hexDigits: Int): (Seq[(Long, String)], Seq[String]) = {
    val terms = queries.flatMap { case (qid, qtext) =>
      qtext.trim.split("\\s+").filter(_.nonEmpty).map(qid -> _)
    }.distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    val buckets = terms.map(_._2).distinct.map { t =>
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, hexDigits)
    }.distinct
    (terms, buckets)
  }

  /** Persist the BM25 index as a PRUNABLE LAYOUT (the writeIvfPartitioned
    * lesson applied to retrieval): postings denormalized with each row's
    * dl and term df — so probe-time needs NO corpus-side join at all —
    * partitioned by the leading `hexDigits` of md5(tok). A query's terms
    * map to a handful of buckets, so the probe read statically prunes to
    * |distinct terms| of the 16^hexDigits partitions before any task
    * launches. Corpus scalars (N, A) land as a one-row parquet beside it.
    *
    * Index size: one (doc_id, tf, dl, tdf) row per posting — the dl/tdf
    * denormalization trades ~2 longs per posting for a join-free probe
    * plan, the standard search-index layout call. */
  def writeIndex(corpus: DataFrame, textCol: String, idCol: String,
                 path: String, hexDigits: Int = 2): Unit = {
    require(hexDigits >= 1 && hexDigits <= 8, "hexDigits must be in [1, 8]")
    val post = postings(corpus, textCol, idCol)
    val dls = docLengths(corpus, textCol, idCol)
    post
      .join(termDf(post), "tok")
      .join(dls, "doc_id")
      .withColumn("bucket", substring(md5(col("tok")), 1, hexDigits))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    dls.agg(count(lit(1)).as("_n"), sum("dl").as("_tl"))
      .selectExpr("_n",
        "case when _n = 0 then 0L else (100 * cast(_tl as decimal(38,0))) div _n end as _a")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a [[writeIndex]] layout: the query terms' md5
    * buckets fold into an IN filter on the partition column, so the scan
    * prunes to the terms' buckets statically; scoring is then a broadcast
    * qterms join + one (qid, doc) reduction + per-query window — the
    * corpus never joins or reshuffles at probe time. Results are
    * bit-identical to [[bm25TopK]] on the same corpus (the driver gate
    * pins this: the x43b oracle is x43's, verbatim). */
  def bm25TopKIndexed(path: String, queries: Seq[(Long, String)], k: Int,
                      hexDigits: Int = 2): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val (terms, buckets) = queryTermsAndBuckets(queries, hexDigits)
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
    val stats = spark.read.parquet(s"$path/stats")
    val scored = post
      .join(broadcast(terms.toDF("qid", "tok")), "tok")
      .join(broadcast(stats))
      .groupBy("qid", "doc_id")
      .agg(sum(expr(termScoreSql)).as("score_q20"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score_q20").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** Incremental index for a GROWING corpus (the x26/x41c append-only
    * staging pattern): each arriving batch appends its postings — (tok,
    * doc_id, tf, dl), bucket-partitioned like [[writeIndex]] — plus ONE
    * (n_docs, sum_dl) stats row. Nothing global is rewritten, so term df
    * and avgdl are NOT denormalized (they would go stale on every
    * append); [[bm25TopKStaged]] recovers both at probe time: df from
    * the pruned buckets themselves (a term's postings all live in its
    * one bucket — counting them there IS the corpus df), corpus scalars
    * by aggregating the metadata-scale stats rows. Requires corpus-wide
    * unique doc ids across batches (the x26 contract).
    *
    * Exactly-once under streaming replay: a bare append is not
    * replay-idempotent — from `foreachBatch`, give each micro-batch its
    * own `path` subtree keyed by the batch id and pre-delete it (the
    * `Curation.appendCardBatch(…, overwrite = true)` discipline,
    * EventStreamsSpec) so a crash-replayed batch overwrites its own
    * postings instead of duplicating them. */
  def appendIndexBatch(batch: DataFrame, textCol: String, idCol: String,
                       path: String, hexDigits: Int = 2): Unit = {
    require(hexDigits >= 1 && hexDigits <= 8, "hexDigits must be in [1, 8]")
    val dls = docLengths(batch, textCol, idCol)
    postings(batch, textCol, idCol)
      .join(dls, "doc_id")
      .withColumn("bucket", substring(md5(col("tok")), 1, hexDigits))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/postings")
    dls.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .write.mode("append").parquet(s"$path/stats_inc")
  }

  /** The maintenance pass the [[appendIndexBatch]] append path needs —
    * the s10b IVF-cell move applied to the postings layout: append
    * batches accrete files per md5(tok) bucket exactly like IVF cells
    * accrete per cid, so after B batches a probe of a bucket pays B file
    * opens + footers. Delegates to
    * [[graft.ops.Scale.compactPartitionedLayout]]: hot-bucket census
    * (O(buckets) driver listing), ONE bucket-pruned read + ONE
    * partitionBy write for every hot bucket within `targetRowsPerFile`
    * (per-bucket fallback for oversized ones), RENAME-FIRST commit with
    * a loud stale-staging refusal. Bucket directories never change, so
    * probe pruning and answers are invisible to compaction — x43d
    * answers x43's oracle verbatim post-compaction, and the ScaleSpec
    * pins the file counts. The per-batch `stats_inc` rows are
    * metadata-scale (one row per batch) and stay append-only.
    *
    * Single-writer: serialize against [[appendIndexBatch]] (the generic
    * pass's contract — an append racing the census-to-swap window can
    * lose its files with the old copy). Returns (bucket, filesBefore,
    * filesAfter) per compacted bucket. */
  def compactIndexBuckets(spark: org.apache.spark.sql.SparkSession,
                          path: String, targetRowsPerFile: Long,
                          maxFilesPerBucket: Int = 1): Seq[(String, Int, Int)] =
    graft.ops.Scale.compactPartitionedLayout(spark, s"$path/postings",
      "bucket", targetRowsPerFile, maxFilesPerBucket,
      ks => col("bucket").isin(ks: _*))

  /** BM25 top-k against an [[appendIndexBatch]] stage: the scan prunes to
    * the query terms' buckets statically; term df is counted from the
    * pruned rows (ONE tok-key window over a buckets-sized frame — never
    * the corpus); (N, A) aggregate from the per-batch stats rows. Results
    * are bit-identical to [[bm25TopK]] over the union of all appended
    * batches (the x43c driver row pins this against x43's oracle). */
  def bm25TopKStaged(path: String, queries: Seq[(Long, String)], k: Int,
                     hexDigits: Int = 2): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val (terms, buckets) = queryTermsAndBuckets(queries, hexDigits)
    val stats = spark.read.parquet(s"$path/stats_inc")
      .agg(sum("n_docs").as("_n"), sum("sum_dl").as("_tl"))
      .selectExpr("_n",
        "case when _n = 0 then 0L else (100 * cast(_tl as decimal(38,0))) div _n end as _a")
    import org.apache.spark.sql.expressions.Window
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .withColumn("tdf", count(lit(1)).over(Window.partitionBy("tok")))
    val scored = post
      .join(broadcast(terms.toDF("qid", "tok")), "tok")
      .join(broadcast(stats))
      .groupBy("qid", "doc_id")
      .agg(sum(expr(termScoreSql)).as("score_q20"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score_q20").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    * the standard HYBRID-retrieval combiner for the lexical ([[bm25TopK]])
    * and dense ([[Similarity.bruteForceTopK]] / ivfTopKJoin) halves.
    * Each input must carry (`qidCol`, `idCol`, `rankCol`) with rank ≥ 1;
    * a candidate's fused score is
    *
    *   rrf_q30 = Σ_lists floor(2^30 / (rrfK + rank))   (absent ⇒ 0)
    *
    * — the classic 1/(k+r) in Q30 fixed point, so the fusion is exact
    * integer arithmetic and bit-stable cross-engine (floor-div, rank > 0).
    * Returns (qid, n_id, rrf_q30, rank) with the fused rank 1..kOut per
    * query, ties broken by id ascending.
    *
    * Scale: fusion touches only the top-k lists (|queries|·k rows per
    * list), never the corpus — one union, one (qid, id) candidate-scale
    * reduce, one per-query window. The exchange key carries two longs. */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
              rankCol: String, rrfK: Int = 60, kOut: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rrfK >= 0 && kOut > 0, "rrfK must be >= 0 and kOut positive")
    val contribs = rankings.map(_.select(
      col(qidCol).cast("long").as("qid"),
      col(idCol).cast("long").as("n_id"),
      expr(s"CAST(1073741824 DIV ($rrfK + CAST($rankCol AS BIGINT)) AS BIGINT)")
        .as("_c")))
    contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("n_id"))
      .agg(sum(col("_c")).as("rrf_q30"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("rrf_q30").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= kOut)
  }

  /** Hard-negative mining for retriever training: candidates the LEXICAL
    * ranker surfaces that the DENSE ranker does not — lexically plausible
    * but semantically distant, the canonical contrastive-training
    * negatives (DPR, Karpukhin et al. 2020). Pure per-query set
    * difference: `lexRanked` anti-joined with `denseRanked` on
    * (`qidCol`, `idCol`), keeping the lexical rank/score columns.
    * Candidate-scale only — both inputs are top-k lists. */
  def hardNegatives(lexRanked: DataFrame, denseRanked: DataFrame,
                    qidCol: String, idCol: String): DataFrame =
    lexRanked.join(denseRanked.select(col(qidCol), col(idCol)),
      Seq(qidCol, idCol), "left_anti")

  /** ALL-TOKEN containment qrels — a deterministic relevance judgment
    * both engines can derive from the corpus alone: a document is
    * RELEVANT to a query iff it contains every distinct query token
    * (boolean-AND retrieval, the strictest lexical ground truth). The
    * pragmatic stand-in for human qrels when evaluating a ranker
    * offline at corpus scale. One (distinct) token-key join + one
    * (qid, doc) aggregation; the per-query token counts broadcast.
    * Returns (qid, doc_id). */
  def containmentQrels(corpus: DataFrame, textCol: String, idCol: String,
                       queries: Seq[(Long, String)]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).distinct.map(w => (q, w))
    }.toDF("qid", "tok")
    val qn = qt.groupBy(col("qid")).agg(count(lit(1)).as("_ev_nq"))
    tokens(corpus, textCol, idCol).distinct()
      .join(qt, "tok")
      .groupBy(col("qid"), col("doc_id")).agg(count(lit(1)).as("_ev_m"))
      .join(broadcast(qn), "qid")
      .filter(col("_ev_m") === col("_ev_nq"))
      .select(col("qid"), col("doc_id"))
  }

  /** RETRIEVAL EVALUATION (the trec_eval surface) of a ranked run
    * against a qrels table, in exact integers: per query —
    * n_rel, hits@k, precision@k and recall@k in Q20, and the reciprocal
    * rank of the first relevant hit in Q20 (MRR's per-query term;
    * 1/rank is RATIONAL, so unlike the log-discounted NDCG the whole
    * metric stays engine-exact). A query with no relevant hit scores
    * rr 0; recall of an empty qrels set is 0 by convention.
    *
    * Candidate-scale only: the run is |queries|·k rows; the one
    * corpus-shaped input is qrels, met by a (qid, doc)-keyed equi-join
    * from the tiny run side. Returns (qid, n_rel, hits, prec_q20,
    * recall_q20, rr_q20). */
  def evalRun(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Seq("qid", "doc_id", "rank").foreach(c => require(run.columns.contains(c),
      s"run must carry (qid, doc_id, rank) — missing $c"))
    // binary relevance is a SET — dedup so a duplicate (qid, doc_id)
    // qrel row can't fan out the join or inflate n_rel (same contract
    // as evalNdcg)
    val rel = qrels.select(col("qid"), col("doc_id")).distinct()
      .withColumn("_ev_rel", lit(1L))
    val per = run.select(col("qid"), col("doc_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(rel, Seq("qid", "doc_id"), "left")
      .groupBy(col("qid"))
      .agg(coalesce(sum(col("_ev_rel")), lit(0L)).as("hits"),
        min(when(col("_ev_rel") === 1L, col("rank"))).as("_ev_fr"))
    val nrel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    per.join(nrel, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        expr(s"(1048576L * hits) div ${k}L").as("prec_q20"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          expr("(1048576L * hits) div n_rel")).otherwise(lit(0L))
          .as("recall_q20"),
        when(col("_ev_fr").isNotNull, expr("1048576L div _ev_fr"))
          .otherwise(lit(0L)).as("rr_q20"))
  }

  /** Q20 log-discount table for [[evalNdcg]]: d_r = ⌊2²⁰/log₂(r+1)⌋ for
    * ranks 1..k. The log is evaluated ONCE, driver-side, and the
    * resulting integers ship as plan literals into BOTH the engine and
    * the oracle SQL — so the cross-engine contract never compares a
    * float: NDCG becomes exact integer arithmetic over a shared
    * constant table (the langIdLists / seededWeightsQ30 single-source
    * pattern), which is how the trec_eval surface gets its last metric
    * without breaking the engine-exact rule [[evalRun]] cites. */
  def ndcgDiscountsQ20(k: Int): Seq[Long] = {
    require(k >= 1 && k <= (1 << 12), s"k must be in [1, 4096]: $k")
    (1 to k).map(r => math.floor((1L << 20).toDouble /
      (math.log(r + 1.0) / math.log(2.0))).toLong)
  }

  /** NDCG@k of a ranked run against binary qrels, exact given a shared
    * Q20 discount table (use [[ndcgDiscountsQ20]]): DCG_q20 = Σ over
    * relevant ranked docs of d_rank; IDCG_q20 = Σ_{r≤min(n_rel,k)} d_r
    * (the ideal ranking front-loads every relevant doc); ndcg_q20 =
    * ⌊2²⁰·DCG/IDCG⌋ (non-negative operands — trunc = floor). A query
    * with no relevant docs scores 0 by the trec_eval convention (same
    * as [[evalRun]]'s recall). Candidate-scale only, the evalRun
    * shape: run is |queries|·k rows, qrels met by one (qid, doc)-keyed
    * equi-join; the discount and its prefix sums are ≤k-entry plan
    * literals. Returns (qid, n_rel, dcg_q20, idcg_q20, ndcg_q20). */
  def evalNdcg(run: DataFrame, qrels: DataFrame, k: Int,
               discQ20: Seq[Long]): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(discQ20.size == k, s"need exactly $k discounts: ${discQ20.size}")
    require(discQ20.forall(_ >= 1), "discounts must be positive")
    require(discQ20.zip(discQ20.tail).forall { case (x, y) => x >= y },
      "discounts must be non-increasing in rank")
    Seq("qid", "doc_id", "rank").foreach(c => require(run.columns.contains(c),
      s"run must carry (qid, doc_id, rank) — missing $c"))
    val disc = typedlit(discQ20)
    val cum = typedlit(discQ20.scanLeft(0L)(_ + _).tail)
    // dedup the qrels: a duplicate (qid, doc_id) row would fan out the
    // left join (double-counting that rank's discount in dcg_q20) AND
    // inflate n_rel/idcg — binary relevance is a SET, so distinct is
    // the semantics, not a defensive copy
    val rel = qrels.select(col("qid"), col("doc_id")).distinct()
      .withColumn("_ev_rel", lit(1L))
    val per = run.select(col("qid"), col("doc_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(rel, Seq("qid", "doc_id"), "left")
      .groupBy(col("qid"))
      .agg(coalesce(sum(when(col("_ev_rel") === 1L,
        element_at(disc, col("rank").cast("int")))), lit(0L)).as("dcg_q20"))
    val nrel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    per.join(nrel, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("dcg_q20"))
      .withColumn("idcg_q20", when(col("n_rel") > 0,
        element_at(cum, least(col("n_rel"), lit(k.toLong)).cast("int")))
        .otherwise(lit(0L)))
      .withColumn("ndcg_q20", when(col("idcg_q20") > 0,
        expr("(1048576L * dcg_q20) div idcg_q20")).otherwise(lit(0L)))
  }

  /** The oracle's scoring expression over HUGEINT — kept beside the Spark
    * form so the two integer formulas can only drift together. `n`/`a`
    * are the stats CTE columns, `tdf`/`tf`/`dl` the per-candidate ones. */
  val oracleTermScoreSql: String =
    """CAST((1048576::HUGEINT * (n - tdf + 1) * tf * 22000 * a)
           // ((tdf + 1)::HUGEINT * (tf * 10000 * a + 120 * (25 * a + 7500 * dl)))
           AS BIGINT)"""
}
