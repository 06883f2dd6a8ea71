package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation: the standard pretrain document filter as ONE
  * declarative pass — exact dedup, length bounds, language allowlist,
  * quality heuristics — emitting a per-document status with the FIRST
  * failing rule as reason (quarantine split semantics, F2/F9: rejected
  * rows are kept and labeled, never silently dropped).
  *
  * Scale: one shuffle total (the dedup window on the 16-byte content
  * hash); every other rule is a codegen'd projection. Rules use unrounded
  * comparisons of deterministically-computed values, so the whole pass is
  * oracle-portable.
  */
object Curation {

  case class Rules(minTokens: Int = 10, allowedLangs: Seq[String] = Nil,
                   maxPunctRatio: Double = 0.2,
                   minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0)

  /** Returns the input plus a `status` column: 'ok' or the first failing
    * rule ('dup' | 'too_short' | 'bad_lang' | 'low_quality'). */
  def curate(df: DataFrame, textCol: String, idCol: String, langCol: String,
             rules: Rules = Rules()): DataFrame = {
    val t = col(textCol)
    val dupRank = row_number().over(
      Window.partitionBy(md5(t)).orderBy(col(idCol)))
    val langOk =
      if (rules.allowedLangs.isEmpty) lit(true)
      else col(langCol).isin(rules.allowedLangs: _*)
    val status =
      when(dupRank > 1, "dup")
        .when(TextStats.tokenCount(t) < rules.minTokens, "too_short")
        .when(!langOk, "bad_lang")
        .when(TextStats.punctRatio(t) > rules.maxPunctRatio ||
          TextStats.meanTokenLen(t) < rules.minMeanTokLen ||
          TextStats.meanTokenLen(t) > rules.maxMeanTokLen, "low_quality")
        .otherwise("ok")
    df.withColumn("status", status)
  }

  /** Split form: (kept, rejected-with-status). */
  def curateSplit(df: DataFrame, textCol: String, idCol: String, langCol: String,
                  rules: Rules = Rules()): (DataFrame, DataFrame) = {
    val c = curate(df, textCol, idCol, langCol, rules)
    (c.filter(col("status") === "ok").drop("status"),
      c.filter(col("status") =!= "ok"))
  }

  /** Curation report: documents per status (A4 breakdown shape). */
  def report(curated: DataFrame): DataFrame =
    curated.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** C4-style LINE-rule cleaning (the Raffel et al. 2020 §2.2 discipline,
    * the rule-based half beside [[graft.ext.Dedup.dedupLinesAcrossCorpus]]'s
    * frequency half): `textCol` is newline-separated lines; a line is KEPT
    * iff it has at least `minWordsPerLine` whitespace-delimited words and
    * contains none of the `banned` markers (case-insensitive substring —
    * the "javascript" / "enable cookies" boilerplate test). A document
    * survives iff at least `minKeptLines` lines remain. Returns the
    * surviving docs with `textCol` rewritten to the kept lines re-joined
    * by \n in original order, plus `n_kept` / `n_dropped` line counts.
    * NULL text is treated as zero lines (the contaminationFraction
    * lesson: never let size(NULL) = -1 artifacts out).
    *
    * Scale: a PURE PROJECTION — the line array never leaves its row, so
    * the pass is zero-exchange at any corpus size. The HOF lambdas read
    * only their element and literal arguments (the wordNgrams
    * interpreted-lambda lesson: nothing captured is re-evaluated per
    * element), and the line array lands in its own column first so the
    * filter reads a bare attribute. */
  def c4LineClean(df: DataFrame, textCol: String, idCol: String,
                  minWordsPerLine: Int = 3, banned: Seq[String] = Nil,
                  minKeptLines: Int = 1): DataFrame = {
    require(minWordsPerLine >= 0 && minKeptLines >= 0,
      "minWordsPerLine and minKeptLines must be non-negative")
    Seq("_lines", "_keptl").foreach { c =>
      require(!df.columns.contains(c), s"c4LineClean reserves column $c")
    }
    val bannedLc = banned.map(_.toLowerCase)
    def wordCount(l: Column): Column =
      when(trim(l) === "", lit(0)).otherwise(size(split(trim(l), "\\s+")))
    def bannedHit(l: Column): Column =
      bannedLc.foldLeft(lit(false))((acc, b) => acc || lower(l).contains(b))
    val kept = filter(col("_lines"),
      l => wordCount(l) >= minWordsPerLine && !bannedHit(l))
    df.withColumn("_lines", split(coalesce(col(textCol), lit("")), "\n"))
      .withColumn("_keptl", kept)
      .withColumn(textCol, array_join(col("_keptl"), "\n"))
      .withColumn("n_kept", size(col("_keptl")).cast("long"))
      .withColumn("n_dropped",
        (size(col("_lines")) - size(col("_keptl"))).cast("long"))
      .filter(col("n_kept") >= minKeptLines)
      .drop("_lines", "_keptl")
  }

  /** HTML main-content extraction — the stage BEFORE [[c4LineClean]] in
    * a web-crawl pipeline (jusText/trafilatura's job, reduced to its
    * deterministic core): strip script/style/comment subtrees, break the
    * page into text blocks at block-level tag boundaries, score each
    * block by word count and ANCHOR-TEXT density (navigation, footers,
    * and ad units are link-dense; body prose is not), and keep blocks
    * with ≥ `minWordsPerBlock` words and ≤ `maxLinkPermille` of their
    * characters inside `<a>` elements. Link density is exact integer
    * per-mille over RAW (untrimmed) tag-stripped lengths, so the rule —
    * and therefore the extraction — replays bit-for-bit in any engine:
    * no DOM, no heuristic scoring floats, RE2-safe regexes (no
    * backreferences — script and style close in separate passes).
    *
    * A pure zero-exchange projection (the x47/x52 shape): regex chains
    * and array HOFs, one codegen stage over the corpus. Returns the
    * input id plus `text_main` (kept blocks' trimmed text joined with
    * newlines), `n_blocks` (non-empty text blocks seen), and `n_kept`
    * — the audit pair every drop rule in this catalog carries. */
  def htmlMainContent(df: DataFrame, htmlCol: String, idCol: String,
                      minWordsPerBlock: Int = 3,
                      maxLinkPermille: Int = 300): DataFrame = {
    require(minWordsPerBlock >= 0, "minWordsPerBlock must be non-negative")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      "maxLinkPermille is per-mille: 0..1000")
    // no idCol exemption: an id column named like an output would yield
    // duplicate output columns — fail loudly instead
    Seq("_hm_blocks", "_hm_kept", "text_main", "n_blocks", "n_kept")
      .foreach { c =>
        require(c != idCol, s"htmlMainContent reserves column $c — rename the id column")
        require(!df.columns.contains(c), s"htmlMainContent reserves column $c")
      }
    val noScript = regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(col(htmlCol), lit("")),
          "(?is)<script\\b[^>]*>.*?</script>", " "),
        "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    // block-level boundaries become newlines; inline markup (<a>, <b>,
    // <span>, ...) stays for the per-block link-density measurement
    val blocked = regexp_replace(noScript,
      "(?i)</?(p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|table|tr|td|th|section|" +
        "article|header|footer|nav|blockquote|pre|title|body|html|head)\\b[^>]*>",
      "\n")
    def plainRaw(b: Column): Column = regexp_replace(b, "<[^>]*>", "")
    def noAnchorRaw(b: Column): Column =
      plainRaw(regexp_replace(b, "(?is)<a\\b[^>]*>.*?</a>", ""))
    // parse each block ONCE into (plain, noAnchor) — the rules and the
    // output all read the struct fields, so the tag-strip regexes run
    // exactly once per block instead of once per rule (the HOF-lambda
    // re-evaluation lesson, PERF.md)
    val parsed = transform(split(blocked, "\n"), b =>
      struct(plainRaw(b).as("p"), noAnchorRaw(b).as("na")))
    def wordsOf(s: Column): Column = {
      val t = trim(s.getField("p"))
      when(t === "", lit(0)).otherwise(size(split(t, "\\s+")))
    }
    // anchor-text chars = raw stripped length minus the anchors-removed
    // stripped length (removal only deletes characters, so this is ≥ 0
    // and exact). The density rule compares CROSS-MULTIPLIED longs —
    // 1000·anchor_chars ≤ maxLinkPermille·block_chars — so there is no
    // division anywhere and the comparison is exact in every engine
    def linkOk(s: Column): Column = {
      val raw = length(s.getField("p")).cast("long")
      val anchor = raw - length(s.getField("na")).cast("long")
      anchor * 1000L <= lit(maxLinkPermille.toLong) * raw
    }
    df.withColumn("_hm_blocks", parsed)
      .withColumn("_hm_kept", filter(col("_hm_blocks"), s =>
        wordsOf(s) >= minWordsPerBlock && linkOk(s)))
      .select(col(idCol),
        array_join(transform(col("_hm_kept"), s => trim(s.getField("p"))), "\n")
          .as("text_main"),
        size(filter(col("_hm_blocks"), s => trim(s.getField("p")) =!= ""))
          .cast("long").as("n_blocks"),
        size(col("_hm_kept")).cast("long").as("n_kept"))
  }

  /** Sliding token-window chunking — the retrieval/embedding input
    * shape ([[graft.ext.Dedup.chunkNearDupPairs]] chunks CHARACTERS for
    * dedup signatures; this chunks TOKENS for models): each document's
    * whitespace token stream emits windows of `window` tokens starting
    * every `stride` tokens (stride < window ⇒ overlapping context, the
    * standard RAG layout), the last window short if the tail is. Chunk
    * identity is (idCol, chunk_id = start div stride) — fully determined
    * by the text, so chunks are reproducible across runs and engines and
    * the chunk table can key joins the way doc ids do. Empty/null texts
    * emit nothing.
    *
    * Scale shape: a pure PROJECTION — split, one generate-sequence
    * explode, per-chunk slice/join, all codegen; no exchange anywhere
    * (the explode multiplies rows ~n/stride-fold, which is the output's
    * size, not a shuffle). Returns (idCol, chunk_id, n_tokens,
    * chunk_text). */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1 && stride <= window,
      "stride must be in [1, window] (stride > window would drop tokens)")
    // no idCol exemption: an id column NAMED like an output (chunk_id,
    // n_tokens, chunk_text) would yield duplicate output columns — fail
    // loudly instead
    Seq("_ck_toks", "_ck_n", "_ck_s", "chunk_id", "n_tokens", "chunk_text")
      .foreach { c =>
        require(c != idCol, s"chunkByTokens reserves column $c — rename the id column")
        require(!df.columns.contains(c), s"chunkByTokens reserves column $c")
      }
    df.filter(col(textCol).isNotNull && TextStats.wsTrim(col(textCol)) =!= "")
      .withColumn("_ck_toks", split(TextStats.wsTrim(col(textCol)), "\\s+"))
      .withColumn("_ck_n", size(col("_ck_toks")))
      .select(col(idCol), col("_ck_toks"), col("_ck_n"),
        explode(sequence(lit(0), col("_ck_n") - 1, lit(stride))).as("_ck_s"))
      .select(col(idCol),
        expr(s"_ck_s div $stride").cast("long").as("chunk_id"),
        least(lit(window), col("_ck_n") - col("_ck_s")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("_ck_toks"), col("_ck_s") + 1, lit(window)))
          .as("chunk_text"))
  }

  /** Deterministic Poisson bootstrap — error bars on a corpus statistic
    * WITHOUT a second data pass or any RNG state (Chamandy et al. 2012's
    * "Estimating Uncertainty for Massive Data Streams" move, made
    * engine-portable): resample `b` gives doc `i` the weight
    * Poisson(1)-quantized from a salted md5 draw (16-bit value against
    * the fixed cumulative thresholds 24109/48218/60273 ≈
    * e⁻¹/2e⁻¹/2.5e⁻¹ · 2¹⁶, weights capped at 3 — the omitted tail mass
    * is < 2 % and the cap is part of the DEFINITION, so every engine
    * replays it exactly). All `nResamples` weighted sums ride ONE
    * aggregation with map-side partials — the resamples are extra
    * COLUMNS, not extra passes — and each resample's mean is an exact
    * Q6 floor-div. Row b = −1 is the unweighted point estimate; the
    * spread of rows 0..B−1 is the bootstrap uncertainty band a dataset
    * card ships beside the point value.
    *
    * Returns (b, w_total, v_total, mean_q6) — `mean_q6` =
    * (10⁶·Σw·v) div Σw, null if the resample drew no mass. Values must
    * be NON-NEGATIVE (token/char masses are): on negative totals
    * Spark's `div` truncates toward zero where DuckDB's `//` floors, so
    * the cross-engine floor claim holds only above zero. */
  def bootstrapMean(df: DataFrame, valueCol: String, idCol: String,
                    nResamples: Int): DataFrame = {
    require(nResamples >= 1 && nResamples <= 64,
      "nResamples in [1, 64] (each adds two aggregation columns)")
    Seq("b", "w_total", "v_total", "mean_q6").foreach(c =>
      require(!df.columns.contains(c) || c == idCol || c == valueCol,
        s"bootstrapMean reserves column $c"))
    def weight(b: Int): Column = {
      val h = conv(substring(md5(concat(col(idCol).cast("string"),
        lit(s":bs:$b"))), 1, 4), 16, 10).cast("long")
      when(h < 24109L, 0L).when(h < 48218L, 1L)
        .when(h < 60273L, 2L).otherwise(3L)
    }
    val v = col(valueCol).cast("decimal(38,0)")
    val aggs =
      (sum(lit(1L)).cast("decimal(38,0)").as("w_m1") +: sum(v).as("v_m1") +:
        (0 until nResamples).flatMap(b => Seq(
          sum(weight(b)).cast("decimal(38,0)").as(s"w_$b"),
          sum(weight(b) * v).as(s"v_$b"))))
    // ONE aggregation job; the B+1 report rows explode out of its single
    // row (a per-branch select would re-run the corpus agg per resample)
    val entries = (-1 +: (0 until nResamples).toList).map { b =>
      val suf = if (b < 0) "m1" else b.toString
      struct(lit(b.toLong).as("b"), col(s"w_$suf").as("w_total"),
        col(s"v_$suf").as("v_total"))
    }
    df.filter(col(valueCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("r"))
      .select(col("r.b").as("b"), col("r.w_total").as("w_total"),
        col("r.v_total").as("v_total"))
      .withColumn("mean_q6",
        when(col("w_total") > 0,
          expr("(1000000 * v_total) div w_total")).cast("long"))
  }

  /** Deterministic hash-stratified sample: keep `k` rows per stratum,
    * chosen by md5 of the id — reproducible across runs AND engines (no
    * RNG state, unlike sampleBy), which is what makes a carved eval set
    * stable and auditable. One shuffle on the strata key; rank is the
    * bounded per-group top-k shape (W2). */
  def hashStratifiedSample(df: DataFrame, strataCols: Seq[String],
                           idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Domain-mixture Bernoulli sampler — the corpus-mixing primitive that
    * hits per-domain TARGET RATES (a training mix like "web 80%, code
    * 50%, low-quality 10%") rather than [[hashStratifiedSample]]'s fixed
    * k-per-stratum. A row survives iff an md5 hash of its id (salted, so
    * the draw is independent of every other hash use in the catalog)
    * lands under its domain's per-mille rate: deterministic across runs,
    * engines, and partitionings — re-running the pipeline reproduces the
    * sample row-for-row, and rates compose (0.8 then 0.5 ≡ two salted
    * draws). A pure filter projection: no shuffle, no RNG state, prunes
    * at the scan when the rate map sends a domain to 0. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    ratesPermille: Map[String, Int],
                    defaultPermille: Int): DataFrame = {
    require((ratesPermille.values ++ Seq(defaultPermille)).forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    val rate = ratesPermille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (d, r)) => when(col(domainCol) === d, lit(r)).otherwise(acc)
    }
    val draw = conv(substring(md5(concat(col(idCol).cast("string"), lit(":mix"))),
      1, 8), 16, 10).cast("long") % 1000
    df.filter(draw < rate)
  }

  /** PRIORITY SAMPLING (Duffield, Lund & Thorup 2007, "Priority sampling
    * for estimation of arbitrary subset sums"): a weight-proportional
    * m-row sample WITHOUT replacement carrying the Horvitz–Thompson
    * adjusted weights that make any subset-sum estimate from the sample
    * unbiased — the third sampler beside [[hashStratifiedSample]]'s
    * fixed-k strata and [[mixtureSample]]'s Bernoulli rates, and the
    * scale move for "estimate token totals / domain mass from m rows
    * instead of scanning the corpus" and for carving a weighted coreset
    * (docs ∝ token count) for mixture design.
    *
    * Deterministic-replay form: the uniform draw is the salted 48-bit
    * md5 hash of the id, u = (h+1)/2⁴⁸ ∈ (0, 1]; the priority is the
    * integer q = w·2⁴⁸ div (h+1) ≥ w (ONE decimal(38,0) floor division,
    * no float anywhere); the sample is the top m by (q desc, id asc) —
    * a TOTAL order, so the boundary is engine-portable (x84 replays it
    * verbatim) — and the threshold τ is the (m+1)-th priority, 0 when
    * the corpus fits inside m (then the sample IS the corpus and
    * ŵ = w exactly). Each sampled row carries ŵ = max(w, τ); by the
    * paper, E[Σ_{sample ∩ S} ŵ] = Σ_S w for every fixed subset S.
    *
    * Scale shape: one projection computes (id, w, q); the top-(m+1) cut
    * is a TakeOrdered (per-partition bottom-k, ONE merge — never a
    * global sort); τ folds back over the m survivors as a one-row
    * broadcast. Weights must be > 0 — a non-positive or null weight
    * raises PER ROW (the packedId loud-bound discipline), because a
    * silently dropped weight skews every downstream estimate.
    *
    * Returns the m sampled rows as (idCol, weightCol, w_adj), ordered
    * semantics only (no rank column — the sample is a SET). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    Seq("_ps_h", "_ps_q", "_ps_tau", "w_adj").foreach(c =>
      require(!df.columns.contains(c),
        s"prioritySample reserves column $c — rename it"))
    val keyed = priorityKeyed(df, Nil, idCol, weightCol)
    val topM1 = keyed
      .orderBy(col("_ps_q").desc, col(idCol)).limit(m + 1)
    val tau = topM1.agg(
      when(count(lit(1)) === (m + 1), min(col("_ps_q")))
        .otherwise(lit(0L)).as("_ps_tau"))
    topM1.orderBy(col("_ps_q").desc, col(idCol)).limit(m)
      .crossJoin(broadcast(tau))
      .select(col(idCol), col(weightCol),
        greatest(col(weightCol), col("_ps_tau")).as("w_adj"))
  }

  /** Shared (id, w, _ps_h, _ps_q) projection of the priority-sampling
    * family: the salted 48-bit draw and the integer priority, with the
    * loud positive-INTEGER-weight contract — a fractional weight (2.7)
    * would silently truncate to 2 and skew every Horvitz–Thompson
    * estimate downstream, so non-integral weights raise PER ROW like
    * non-positive ones (pre-quantize fractional weights to a fixed
    * point, e.g. Q20, before sampling). */
  private def priorityKeyed(df: DataFrame, strataCols: Seq[String],
                            idCol: String, weightCol: String): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":pri"))), 1, 12), 16, 10).cast("long")
    val wOk = col(weightCol).isNotNull && col(weightCol) > 0 &&
      col(weightCol).cast("long") === col(weightCol)
    df.select((strataCols.map(col) :+ col(idCol) :+ col(weightCol)): _*)
      .withColumn("_ps_h", h)
      .withColumn("_ps_q",
        when(wOk, expr(
          s"cast((cast($weightCol as decimal(38,0)) * 281474976710656)" +
            " div (_ps_h + 1L) as bigint)"))
          .otherwise(raise_error(concat(
            lit(s"prioritySample needs positive integer weights " +
              s"(quantize fractional weights first); $weightCol = "),
            coalesce(col(weightCol).cast("string"), lit("null"))))))
      .withColumn(weightCol, col(weightCol).cast("long"))
  }

  /** STRATIFIED [[prioritySample]]: an independent weight-proportional
    * m-row priority sample PER STRATUM, each row carrying its stratum's
    * Horvitz–Thompson ŵ = max(w, τ_stratum) — the balanced weighted
    * coreset (per-language, per-source) a mixture designer actually
    * draws, where the flat sampler would let one giant domain crowd out
    * the rest. Same integer priorities and take-all-regime exactness as
    * the flat form, same md5 draw (a row's priority is independent of
    * how the corpus is stratified).
    *
    * Scale shape: ONE pass builds the priorities; the per-stratum top-
    * (m+1) is the W2 bounded window (partitioned by the strata — never
    * global); τ_stratum = the (m+1)-th priority where the stratum
    * overflows m (else 0 — that stratum is exact), derived from the
    * kept rows with one strata-keyed aggregate joined back. Returns
    * (strata..., idCol, weightCol, w_adj). */
  def prioritySampleStratified(df: DataFrame, strataCols: Seq[String],
                               idCol: String, weightCol: String,
                               m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    Seq("_ps_h", "_ps_q", "_ps_rn", "_ps_tau", "w_adj").foreach(c =>
      require(!df.columns.contains(c),
        s"prioritySampleStratified reserves column $c — rename it"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col("_ps_q").desc, col(idCol))
    val kept = priorityKeyed(df, strataCols, idCol, weightCol)
      .withColumn("_ps_rn", row_number().over(w))
      .filter(col("_ps_rn") <= m + 1)
    val tau = kept.groupBy(strataCols.map(col): _*)
      .agg(coalesce(max(when(col("_ps_rn") === m + 1, col("_ps_q"))),
        lit(0L)).as("_ps_tau"))
    kept.filter(col("_ps_rn") <= m)
      .join(tau, strataCols)
      .select((strataCols.map(col) :+ col(idCol) :+ col(weightCol) :+
        greatest(col(weightCol), col("_ps_tau")).as("w_adj")): _*)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much its hashed-token distribution resembles a TARGET subset of
    * the same corpus (the "high-quality reference" — in-domain text,
    * curated pages, …), then keep the top `k` scorers. DSIR's importance
    * weight is a product of per-feature probability ratios
    * p_target(f)/p_raw(f) over hashed n-gram features; engines disagree
    * on `ln`'s last ulp, so the cross-engine-EXACT form used here scores
    * each token bucket by its add-1-smoothed probability ratio in Q20
    *
    *   r(b) = floor( 2^20 · (ct(b)+1)·(TR+B) / ((cr(b)+1)·(TT+B)) )
    *
    * (ct/cr = target/raw token counts of bucket b, TT/TR their corpus
    * totals, B the bucket count) and takes the per-document MEAN bucket
    * ratio — monotone in the same "looks like the target" direction as
    * DSIR's log-ratio sum, but every step is exact integer arithmetic
    * (products in decimal(38,0), one floor-div; exact up to ~10^15-token
    * corpora — two orders past a 100 TB text corpus). Deterministic
    * top-k replaces the paper's Gumbel perturbation (their "top-k
    * heuristic" variant): ties break toward the lower id.
    *
    * Scale shape: one explode + ONE bucket-key exchange computes both
    * count columns (conditional sum — the target is a predicate, not a
    * second scan); the B-row ratio table and the one-row totals ride the
    * plan as broadcasts; the per-doc reduce is an id-keyed agg with
    * map-side partials; the top-k is TakeOrdered (per-partition heap +
    * driver merge), never a global sort.
    *
    * Returns (idCol, score_q20), the k highest-scoring documents. */
  def dsirTopK(df: DataFrame, textCol: String, idCol: String,
               isTarget: Column, buckets: Int = 64, k: Int = 100): DataFrame = {
    require(buckets >= 1 && buckets <= 256,
      "bucket count must fit the 2-hex-digit hash")
    require(k >= 1, "k must be positive")
    Seq("_ds_t", "_ds_b", "_ds_cr", "_ds_ct", "_ds_tr", "_ds_tt",
        "_ds_r", "_ds_s", "_ds_n", "score_q20").foreach { c =>
      require(c != idCol, s"dsirTopK reserves column $c — rename the id column")
      require(!df.columns.contains(c), s"dsirTopK reserves column $c")
    }
    val toks = df
      .select(col(idCol), isTarget.cast("boolean").as("_ds_t"),
        explode(split(TextStats.wsTrim(col(textCol)), "\\s+")).as("_ds_tok"))
      .filter(col("_ds_tok") =!= "")
      .select(col(idCol), col("_ds_t"),
        (conv(substring(md5(col("_ds_tok")), 1, 2), 16, 10).cast("long")
          % buckets).as("_ds_b"))
    val cnt = toks.groupBy(col("_ds_b")).agg(
      count(lit(1)).as("_ds_cr"),
      sum(when(col("_ds_t"), 1L).otherwise(0L)).as("_ds_ct"))
    val tot = cnt.agg(sum(col("_ds_cr")).as("_ds_tr"),
      sum(col("_ds_ct")).as("_ds_tt"))
    val ratio = cnt.crossJoin(broadcast(tot)).select(col("_ds_b"), expr(
      s"""(cast(_ds_ct + 1 as decimal(38,0)) * (_ds_tr + $buckets) * 1048576)
          div (cast(_ds_cr + 1 as decimal(38,0)) * (_ds_tt + $buckets))""")
      .as("_ds_r"))
    toks.join(broadcast(ratio), Seq("_ds_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_ds_r")).as("_ds_s"), count(lit(1)).as("_ds_n"))
      .select(col(idCol),
        expr("_ds_s div _ds_n").cast("long").as("score_q20"))
      .orderBy(col("score_q20").desc, col(idCol))
      .limit(k)
  }

  /** Temperature-flattened domain mixing at α = 1/2 — the multilingual-
    * pretraining standard (mT5/XLM-R sample language ℓ with probability
    * ∝ n_ℓ^α so head languages stop drowning the tail). Sampling domain
    * d at p(d) ∝ n_d^α means each ROW of d survives with rate
    * ∝ n_d^(α−1) = 1/√n_d at α = 1/2; normalizing so the SMALLEST domain
    * keeps everything gives the exact integer per-mille rate
    *
    *   rate(d) = (1000 · isqrt(n_min · n_d)) div n_d        (≤ 1000)
    *
    * with isqrt the exact integer square root (floor(√·) from one IEEE
    * sqrt plus a ±1 integer correction — both engines land on the same
    * integer). Unlike [[mixtureSample]] the rates are DATA-DRIVEN —
    * recomputed from the live domain counts, no hand-tuned map. The
    * survivor draw is the same salted id-hash Bernoulli, so membership
    * is deterministic across runs, engines, and partitionings.
    *
    * Scale shape: one domain-key count agg (map-side partials; the table
    * is |domains| rows), a one-row min broadcast, and the rate table
    * broadcast back onto the corpus — the big side takes a zero-exchange
    * filter. Exact while n_min·n_d < 2^63 (domains to ~3·10^9 rows);
    * beyond that compute rates on a sampled count. Null domains are a
    * domain of their own (null-safe join). */
  def sqrtTemperatureSample(df: DataFrame, idCol: String,
                            domainCol: String): DataFrame = {
    Seq("_tm_n", "_tm_min", "_tm_c", "_tm_rate", "_tm_d").foreach { c =>
      require(c != idCol && c != domainCol,
        s"sqrtTemperatureSample reserves column $c — rename the input column")
      require(!df.columns.contains(c), s"sqrtTemperatureSample reserves column $c")
    }
    val cnts = df.groupBy(col(domainCol).as("_tm_d"))
      .agg(count(lit(1)).as("_tm_n"))
    val nMin = cnts.agg(min(col("_tm_n")).as("_tm_min"))
    // exact isqrt of n_min·n_d: one IEEE sqrt then the standard ±1
    // correction (a double is within 1 ulp of the true root, so one
    // step each way suffices below 2^63)
    val prod = col("_tm_n") * col("_tm_min")
    val c0 = floor(sqrt(prod.cast("double"))).cast("long")
    val c1 = when(c0 * c0 > prod, c0 - 1).otherwise(c0)
    val c2 = when((c1 + 1) * (c1 + 1) <= prod, c1 + 1).otherwise(c1)
    val rates = cnts.crossJoin(broadcast(nMin))
      .select(col("_tm_d"), c2.as("_tm_c"), col("_tm_n"))
      .select(col("_tm_d"),
        expr("(1000 * _tm_c) div _tm_n").as("_tm_rate"))
    val draw = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":tmix"))), 1, 8), 16, 10).cast("long") % 1000
    df.join(broadcast(rates), col(domainCol) <=> col("_tm_d"))
      .filter(draw < col("_tm_rate"))
      .drop("_tm_d", "_tm_rate")
  }

  /** Host-level curation — judge the SITE, not just the page (the
    * RefinedWeb/C4 move: URL/host rules run BEFORE content rules, because
    * boilerplate mills and mirror farms emit pages that individually pass
    * doc-level filters). Two exact per-host per-mille signals:
    *
    *   dup_pm   = 1000·(n_docs − distinct_texts) div n_docs
    *   short_pm = 1000·|{docs with < minWords words}| div n_docs
    *
    * and every document of a host that trips either threshold is dropped
    * wholesale. Both signals are exact integer arithmetic on md5 digests
    * and whitespace word counts, so host verdicts replay in ANSI SQL. A
    * null host is a host of its own (null-safe join), same convention as
    * [[sqrtTemperatureSample]].
    *
    * Scale shape: ONE host-keyed aggregation over a (host, digest,
    * wordcount) projection — the 16-byte digest stands in for the text,
    * so the exchange never carries documents (the x27 discipline); the
    * count-distinct runs as Spark's standard two-phase expand. The
    * |hosts|-row verdict table joins back as a broadcast: the corpus side
    * takes a zero-exchange filter. Survivors keep their columns plus the
    * host's (dup_pm, short_pm) for audit. */
  def hostFilter(df: DataFrame, textCol: String, hostCol: String,
                 maxDupPermille: Int, maxShortPermille: Int,
                 minWords: Int): DataFrame = {
    require(maxDupPermille >= 0 && maxDupPermille <= 1000 &&
      maxShortPermille >= 0 && maxShortPermille <= 1000,
      "thresholds are per-mille: 0..1000")
    require(minWords >= 1, "minWords must be >= 1")
    Seq("_hf_h", "_hf_d", "_hf_wc", "_hf_n", "_hf_nd", "_hf_short",
        "dup_pm", "short_pm").foreach(c =>
      require(!df.columns.contains(c), s"hostFilter reserves column $c"))
    val wc = size(filter(split(TextStats.wsTrim(col(textCol)), "\\s+"),
      t => t =!= ""))
    val stats = df
      .select(col(hostCol).as("_hf_h"), md5(col(textCol)).as("_hf_d"),
        wc.as("_hf_wc"))
      .groupBy(col("_hf_h"))
      .agg(count(lit(1)).as("_hf_n"),
        countDistinct(col("_hf_d")).as("_hf_nd"),
        sum(when(col("_hf_wc") < minWords, 1L).otherwise(0L)).as("_hf_short"))
    val verdict = stats.select(col("_hf_h"),
      expr("(1000 * (_hf_n - _hf_nd)) div _hf_n").as("dup_pm"),
      expr("(1000 * _hf_short) div _hf_n").as("short_pm"))
    df.join(broadcast(verdict), col(hostCol) <=> col("_hf_h"))
      .filter(col("dup_pm") <= maxDupPermille &&
        col("short_pm") <= maxShortPermille)
      .drop("_hf_h")
  }

  /** Release-to-release corpus delta — the datasheet DIFF between two
    * corpus versions ([[datasetCard]] describes ONE release; consumers of
    * a refreshed corpus ask what CHANGED: how many docs appeared,
    * vanished, were edited, and what the token-mass swing is, per
    * domain). Rows align by `idCol`; change detection is a null-safe md5
    * compare, so a doc whose text is byte-identical never counts as
    * changed and null texts compare sanely. All outputs are exact
    * integers (consumers derive rates), so the whole delta hash-verifies.
    *
    * Scale shape: both corpora project to (id, groups, 16-byte digest,
    * token count) — text never reaches the join — then ONE id-keyed
    * full-outer join (the m1/m2 merge discipline) and one group rollup
    * with map-side partials. `idCol` must be unique per side (it is a
    * version KEY; duplicate keys would cross-product in the join — run
    * [[graft.ops.Merge.scd2Merge]]-style validation upstream if unsure).
    *
    * Returns one row per group: n_added, n_removed, n_changed,
    * n_unchanged, tok_delta (Σ new tokens − Σ old tokens; null-text docs
    * contribute 0). */
  def releaseDelta(oldDf: DataFrame, newDf: DataFrame, textCol: String,
                   idCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "releaseDelta groups by at least one column")
    val reserved = Seq("_rd_id_o", "_rd_id_n", "_rd_d_o", "_rd_d_n",
      "_rd_n_o", "_rd_n_n", "_rd_st", "_rd_dn", "n_added", "n_removed",
      "n_changed", "n_unchanged", "tok_delta")
    Seq(oldDf, newDf).foreach(df => reserved.foreach(c =>
      require(!df.columns.contains(c), s"releaseDelta reserves column $c")))
    def wc(c: Column): Column =
      size(filter(split(TextStats.wsTrim(c), "\\s+"), t => t =!= ""))
    def proj(df: DataFrame, tag: String) = df.select(
      col(idCol).as(s"_rd_id_$tag") +:
        groupCols.map(c => col(c).as(s"_rd_${c}_$tag")) :+
        md5(col(textCol)).as(s"_rd_d_$tag") :+
        wc(col(textCol)).cast("long").as(s"_rd_n_$tag"): _*)
    val j = proj(oldDf, "o")
      .join(proj(newDf, "n"), col("_rd_id_o") === col("_rd_id_n"),
        "full_outer")
    val st = when(col("_rd_id_o").isNull, "added")
      .when(col("_rd_id_n").isNull, "removed")
      .when(!(col("_rd_d_o") <=> col("_rd_d_n")), "changed")
      .otherwise("unchanged")
    j.select(
        groupCols.map(c =>
          coalesce(col(s"_rd_${c}_n"), col(s"_rd_${c}_o")).as(c)) ++
          Seq(st.as("_rd_st"),
            (coalesce(col("_rd_n_n"), lit(0L)) -
              coalesce(col("_rd_n_o"), lit(0L))).as("_rd_dn")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("_rd_st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("_rd_st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("_rd_st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("_rd_st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(col("_rd_dn")).as("tok_delta"))
  }

  /** Per-domain TOKEN-BUDGET sampling — the form pretrain mixtures are
    * actually specified in ("30B tokens of code, 5B of forums"), vs
    * [[mixtureSample]]'s row rates and [[hashStratifiedSample]]'s k rows.
    * Rows take a stable salted-hash order within their domain and survive
    * while the EXCLUSIVE running token total stays under the domain's
    * budget — each domain contributes its budgeted token mass (the last
    * survivor may overshoot by less than its own length: the standard
    * greedy cut), deterministically across runs, engines, and
    * partitionings. Domains absent from the map take `defaultBudget`;
    * budget 0 drops the domain entirely. One window shuffle on the domain
    * key; a hot domain is ONE task here (window, not agg) — at extreme
    * skew pre-thin with [[mixtureSample]] or chunk with the
    * [[graft.ops.Scale.saltedRunningSum]] pattern. */
  def sampleByTokenBudget(df: DataFrame, idCol: String, domainCol: String,
                          tokenCol: String, budgets: Map[String, Long],
                          defaultBudget: Long): DataFrame = {
    require(!df.columns.contains("_cum_tok"),
      "sampleByTokenBudget reserves column _cum_tok")
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "budgets are token counts: >= 0")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (d, b)) => when(col(domainCol) === d, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":budget"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_cum_tok", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .filter(col("_cum_tok") < budget)
      .drop("_cum_tok")
  }

  /** Greedy token-budget packing (training-batch assembly): documents in
    * deterministic order per group are assigned to consecutive bins by
    * EXCLUSIVE prefix token count — a document opens a new bin when the
    * tokens before it fill the budget. Streaming-packing semantics (one
    * pass, no global optimization), exact integer arithmetic, one
    * shuffle on the group key. */
  def packByTokenBudget(df: DataFrame, groupCols: Seq[String], idCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget).cast("long"))
  }

  /** Incremental [[packSequences]] for a GROWING corpus: the only state
    * is an APPEND-ONLY carry stage — one (groupCols..., n_carry) row per
    * group PER BATCH ([[batchCarry]], appended after packing, the
    * spanHashes/signature-stage contract) — aggregated to per-group
    * totals on read (metadata-scale: rows = groups × batches). A new
    * batch packs with its groups' offsets continuing from the total, so
    * sequences keep numbering exactly where the previous batch stopped
    * and a group's tail sequence is COMPLETED by the next batch (same
    * seq_id, the ids that fill it). Parity with the one-shot form is the
    * contract: for every (group, seq_id), concatenating the per-batch
    * increments in batch order equals packing the concatenated corpus
    * once (ExtSpec pins it, including a tail completed across the batch
    * boundary). */
  def packSequencesIncremental(newDf: DataFrame, carryPath: String,
                               groupCols: Seq[String], idCol: String,
                               idsCol: String, seqLen: Int): DataFrame = {
    val carry = newDf.sparkSession.read.parquet(carryPath)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_carry")).as("n_carry"))
    packSequencesWithBase(newDf, broadcast(carry), groupCols, idCol,
      idsCol, seqLen)
  }

  /** The batch's per-group id mass — append to the carry stage AFTER
    * packing the batch. */
  def batchCarry(newDf: DataFrame, groupCols: Seq[String],
                 idsCol: String): DataFrame =
    newDf.groupBy(groupCols.map(col): _*)
      .agg(sum(size(col(idsCol)).cast("long")).as("n_carry"))

  private def packSequencesWithBase(df: DataFrame, base: DataFrame,
                                    groupCols: Seq[String], idCol: String,
                                    idsCol: String, seqLen: Int): DataFrame = {
    reservePackCols(df, idCol)
    require(!df.columns.contains("n_carry"),
      "packSequencesIncremental reserves column n_carry")
    val withBase = df.join(base, groupCols.toSeq, "left")
      .withColumn("_ps_base", coalesce(col("n_carry"), lit(0L)))
      .drop("n_carry")
    packSequencesFrom(withBase, groupCols, idCol, idsCol, seqLen)
  }

  /** Fixed-length SEQUENCE packing — the actual pretraining input shape:
    * each group's token-id stream (docs concatenated in `idCol` order)
    * chunks into consecutive sequences of `seqLen` ids, crossing document
    * boundaries; the final sequence per group may be short (no padding —
    * the trainer's collator owns pad tokens). [[packByTokenBudget]]
    * assigns whole DOCS to bins; this packs the IDS themselves.
    *
    * Scale shape: per-doc lengths ride the same exclusive-prefix window
    * as x19 (one shuffle on the group key; salt skewed groups upstream —
    * the s4 recipe); the exploded stream then carries (group, seq_id,
    * local_pos, vid) INTS ONLY into one (group, seq_id) reassembly
    * aggregation. Token text never appears — input is already encoded.
    * Deterministic: doc order and in-doc positions fully order every id. */
  def packSequences(df: DataFrame, groupCols: Seq[String], idCol: String,
                    idsCol: String, seqLen: Int): DataFrame = {
    reservePackCols(df, idCol)
    packSequencesFrom(df.withColumn("_ps_base", lit(0L)),
      groupCols, idCol, idsCol, seqLen)
  }

  /** Deterministic epoch shuffle — the training-order randomization step
    * between curation and batch assembly. Each row is assigned to one of
    * 16^hexDigits batches by the leading hex digits of
    * `md5(seed ":" id...)`, and ordered within its batch by the full
    * digest (id columns as a formal tiebreak): consuming batches in
    * (batch, pos) order replays a uniform pseudo-random permutation of
    * the corpus that any engine can reproduce from (seed, ids) alone —
    * no RNG state, so a re-run, a resumed job, and the DuckDB oracle all
    * see the identical order. A new seed (e.g. the epoch number) yields
    * an independent permutation. Requires the id columns to be non-null
    * and unique per row (the catalog's id contract): duplicate id tuples
    * would tie both the digest and the tiebreak, leaving their relative
    * order engine-dependent.
    *
    * Scale: ONE exchange on the batch key; the per-batch row_number sorts
    * corpus/16^hexDigits rows per partition — size `hexDigits` so a batch
    * fits an executor (4 digits = 65 536 batches ≈ 1.5 GB/batch at
    * 100 TB). No global sort, no driver state. MD5 is the catalog's
    * cross-engine hash (x1/x27 precedent).
    *
    * Returns the input plus (batch, pos). */
  def epochShuffle(df: DataFrame, idCols: Seq[String], seed: Long,
                   hexDigits: Int = 4): DataFrame = {
    require(idCols.nonEmpty, "epochShuffle needs at least one id column")
    require(hexDigits >= 1 && hexDigits <= 16,
      "hexDigits must be in [1, 16]")
    Seq("_es_h", "batch", "pos").foreach(c =>
      require(!df.columns.contains(c), s"epochShuffle reserves column $c"))
    val h = md5(concat_ws(":",
      (lit(seed).cast("string") +: idCols.map(c => col(c).cast("string"))): _*))
    val order = col("_es_h") +: idCols.map(col)
    df.withColumn("_es_h", h)
      .withColumn("batch", substring(col("_es_h"), 1, hexDigits))
      .withColumn("pos", row_number().over(
        Window.partitionBy("batch").orderBy(order: _*)).cast("long"))
      .drop("_es_h")
  }

  /** Quality-curriculum training order: rows are banded by ABSOLUTE
    * score range — `band = min(nBands−1, floor(score·nBands / 2^30))`
    * over a Q30 score column, a zero-exchange projection (a rank-quantile
    * decile would need a global sort; fixed bands don't and stay
    * deterministic under corpus growth) — then [[epochShuffle]]-style
    * randomized WITHIN each band: batch by the md5 digest's leading hex,
    * pos by the digest. Consuming (band desc, batch, pos) anneals
    * training from the highest-quality band down, with a reproducible
    * uniform shuffle inside each band. Null scores (e.g. docs the LM
    * scorer returns no pairs for) band as 0. One (band, batch)-key
    * exchange; same id contract as [[epochShuffle]].
    *
    * Returns the input plus (band, batch, pos). */
  def curriculumOrder(df: DataFrame, idCols: Seq[String], scoreQ30Col: String,
                      nBands: Int, seed: Long, hexDigits: Int = 4): DataFrame = {
    require(idCols.nonEmpty, "curriculumOrder needs at least one id column")
    require(nBands >= 1 && nBands <= 1024, "nBands must be in [1, 1024]")
    require(hexDigits >= 1 && hexDigits <= 16, "hexDigits must be in [1, 16]")
    Seq("_cu_h", "band", "batch", "pos").foreach(c =>
      require(!df.columns.contains(c), s"curriculumOrder reserves column $c"))
    val h = md5(concat_ws(":",
      (lit(seed).cast("string") +: idCols.map(c => col(c).cast("string"))): _*))
    val order = col("_cu_h") +: idCols.map(col)
    df.withColumn("band", expr(
        s"least(${nBands - 1}L, greatest(0L, (coalesce($scoreQ30Col, 0L) * ${nBands}L) div 1073741824L))"))
      .withColumn("_cu_h", h)
      .withColumn("batch", substring(col("_cu_h"), 1, hexDigits))
      .withColumn("pos", row_number().over(
        Window.partitionBy("band", "batch").orderBy(order: _*)).cast("long"))
      .drop("_cu_h")
  }

  /** Token-balanced output sharding — the DELIVERY side of a data build:
    * a finished corpus ships as `nShards` same-cost files, so every
    * downstream reader (a training job's data loaders, most of all) gets
    * an even slice. Exact bin-packing needs a global order; this is the
    * scale-first approximation with NO global sort and no driver state:
    *
    *   1. `band = weight div bandWidth` groups rows of similar cost — a
    *      zero-exchange projection;
    *   2. within a band, rows take a salted-md5 order and round-robin
    *      across shards (`(band + salt + rn − 1) mod nShards`): same-band
    *      rows differ by < bandWidth tokens, so each shard's take from a
    *      (band, salt) group is even to ±1 row, and the (band + salt)
    *      offset staggers WHICH shard eats each group's remainder.
    *
    * The window partitions on (band, salt16) — the hex digit bounds a hot
    * band to 1/16 of its rows per task (the saltedRunningSum move; dense
    * corpora concentrate in few bands, so banding alone would serialize).
    * Deterministic across runs, engines, and partitionings: the draw is
    * md5(id∥":shard"), ties broken by id — ids must be unique (the
    * catalog's id contract). Weights must be non-negative; a weight ≥
    * ~2^63/nShards would overflow the offset arithmetic long before any
    * real token count does.
    *
    * Returns the input plus `shard` (int in [0, nShards)). Write with
    * `.write.partitionBy("shard")` for the N-files layout. */
  def assignShards(df: DataFrame, idCol: String, weightCol: String,
                   nShards: Int, bandWidth: Long = 64L): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    require(bandWidth >= 1, "bandWidth must be positive")
    Seq("_sh_h", "_sh_w", "_sh_band", "_sh_salt", "_sh_rn", "shard").foreach(c =>
      require(!df.columns.contains(c), s"assignShards reserves column $c"))
    val h = md5(concat(col(idCol).cast("string"), lit(":shard")))
    df.withColumn("_sh_h", h)
      // null weight bands as zero-cost (a null band would propagate into
      // a null shard and a __HIVE_DEFAULT_PARTITION__ bucket on write).
      // The weight routes through col() into a reserved name FIRST so an
      // unusual caller column name (dashes, spaces) can't be misparsed by
      // the integral-divide expr below.
      .withColumn("_sh_w", coalesce(col(weightCol).cast("bigint"), lit(0L)))
      .withColumn("_sh_band", expr(s"_sh_w div ${bandWidth}L"))
      // leading hex digit of the draw → 16 deterministic salts
      .withColumn("_sh_salt",
        (instr(lit("0123456789abcdef"), substring(col("_sh_h"), 1, 1)) - 1)
          .cast("long"))
      .withColumn("_sh_rn", row_number().over(
        Window.partitionBy(col("_sh_band"), col("_sh_salt"))
          .orderBy(col("_sh_h"), col(idCol))).cast("long"))
      .withColumn("shard",
        pmod(col("_sh_band") + col("_sh_salt") + col("_sh_rn") - 1,
          lit(nShards.toLong)).cast("int"))
      .drop("_sh_h", "_sh_w", "_sh_band", "_sh_salt", "_sh_rn")
  }

  /** Dataset card — the datasheet rollup a corpus release ships with:
    * per-dimension (and grand-total, via ROLLUP) document counts, token
    * and character mass, exact-duplicate counts, and length extremes.
    * Every metric is an exact integer, so the whole card is
    * oracle-portable (no float means — consumers derive them from the
    * sums).
    *
    * Scale: one window shuffle on the 16-byte content digest marks
    * duplicates (the curate dup rule), then one rollup aggregation over
    * the dimension keys with map-side partials. */
  def datasetCard(df: DataFrame, textCol: String,
                  dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "datasetCard needs at least one dimension")
    // non-dim input columns are projected away by the agg, so only the
    // dup-flag working name and dim/output collisions can bite
    require(!df.columns.contains("_dc_dup"), "datasetCard reserves _dc_dup")
    Seq("n_docs", "n_tokens", "n_chars", "n_dup_docs", "min_tok", "max_tok")
      .foreach(c => require(!dimCols.contains(c),
        s"datasetCard reserves output column $c — rename the dimension"))
    val t = col(textCol)
    val dup = (count(lit(1)).over(Window.partitionBy(md5(t))) > 1 &&
      t.isNotNull).cast("long")
    val nTok = TextStats.tokenCount(t).cast("long")
    df.withColumn("_dc_dup", dup)
      .rollup(dimCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(nTok).as("n_tokens"),
        sum(coalesce(length(t), lit(0)).cast("long")).as("n_chars"),
        sum(col("_dc_dup")).as("n_dup_docs"),
        min(nTok).as("min_tok"), max(nTok).as("max_tok"))
  }

  /** Append one batch's [[datasetCard]] state to a staged card at `path`
    * — the x26/x43c append-only discipline applied to the REPORTING op,
    * so a growing corpus keeps its datasheet current without ever
    * rescanning old batches. The state is one row per (content digest ×
    * dimension tuple) with its doc count and the (digest-determined)
    * token/char numbers: O(distinct texts), not O(docs), and dup marking
    * stays exact across batches because duplicate texts collide on the
    * digest no matter which batch they arrived in. Null text keys a
    * distinct '0' sentinel (never counted dup, zero mass — the
    * [[datasetCard]] contract); real digests carry a '1' prefix so the
    * domains can't collide.
    *
    * Exactly-once under streaming replay: a bare append is NOT
    * replay-idempotent — a micro-batch re-delivered after a crash
    * between the append and the checkpoint commit would double-count.
    * From `foreachBatch`, write each batch to its own subdir with
    * `overwrite = true` (`appendCardBatch(b, …, s"$stage/batch=$id",
    * overwrite = true)`): a replayed batch then overwrites its own
    * state instead of duplicating it, and [[datasetCardFromStaged]]
    * reads the partitioned stage unchanged (the extra partition column
    * is dropped by its aggregations). EventStreamsSpec pins the
    * crash-replay parity. */
  def appendCardBatch(batch: DataFrame, textCol: String,
                      dimCols: Seq[String], path: String,
                      overwrite: Boolean = false): Unit = {
    require(dimCols.nonEmpty, "appendCardBatch needs at least one dimension")
    Seq("_h", "_n", "_tok", "_nch", "_tok2", "_nch2").foreach(c =>
      require(!dimCols.contains(c) && c != textCol,
        s"appendCardBatch reserves column $c"))
    val t = col(textCol)
    val h = when(t.isNull, lit("0")).otherwise(concat(lit("1"), md5(t)))
    batch
      .select((dimCols.map(col) :+ h.as("_h")
        :+ TextStats.tokenCount(t).cast("long").as("_tok")
        :+ coalesce(length(t), lit(0)).cast("long").as("_nch")): _*)
      .groupBy((col("_h") +: dimCols.map(col)): _*)
      // same digest = same text, so _tok/_nch are constant per group
      .agg(count(lit(1)).as("_n"), min(col("_tok")).as("_tok2"),
        min(col("_nch")).as("_nch2"))
      .withColumnRenamed("_tok2", "_tok").withColumnRenamed("_nch2", "_nch")
      .write.mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  /** The [[datasetCard]] answered from an [[appendCardBatch]] stage —
    * bit-identical to the one-shot card over the union of all appended
    * batches (the x51b driver row pins this against x51's oracle).
    * Re-merges per-batch rows for the same (digest, dims) key, marks a
    * digest dup when its doc count ACROSS all dims and batches exceeds 1
    * (one digest-key window over the digest-sized frame — never the
    * corpus), then rolls up exactly like the one-shot. */
  def datasetCardFromStaged(spark: org.apache.spark.sql.SparkSession,
                            path: String, dimCols: Seq[String]): DataFrame = {
    val merged = spark.read.parquet(path)
      .groupBy((col("_h") +: dimCols.map(col)): _*)
      .agg(sum(col("_n")).as("_n"), min(col("_tok")).as("_tok"),
        min(col("_nch")).as("_nch"))
    val dupN = when(
      sum(col("_n")).over(Window.partitionBy(col("_h"))) > 1 &&
        col("_h").startsWith("1"), col("_n")).otherwise(lit(0L))
    merged.withColumn("_dup_n", dupN)
      .rollup(dimCols.map(col): _*)
      .agg(sum(col("_n")).as("n_docs"),
        sum(col("_n") * col("_tok")).as("n_tokens"),
        sum(col("_n") * col("_nch")).as("n_chars"),
        sum(col("_dup_n")).as("n_dup_docs"),
        min(col("_tok")).as("min_tok"), max(col("_tok")).as("max_tok"))
  }

  /** T5-style span corruption — the denoising-objective data prep
    * (Raffel et al. 2020 §3.1.4): tokens are chunked into fixed
    * `spanLen` windows; each chunk is masked with probability
    * `ratePct`% by a DETERMINISTIC salted draw (md5 of id:chunk — same
    * engine-portable Bernoulli as [[mixtureSample]], so the corruption
    * replays bit-for-bit across runs, engines, and partitionings, and
    * re-running the pipeline regenerates the identical training pairs).
    * The k-th masked chunk (in order) becomes `<extra_id_k>` in the
    * INPUT; the TARGET is the standard sentinel-delimited sequence of
    * the masked-out spans. Degenerate docs (null/blank text) emit empty
    * input/target with n_masked = 0.
    *
    * Scale: a PURE PROJECTION — zero exchanges at any corpus size. Every
    * HOF lambda reads only its element argument and bare attributes (the
    * wordNgrams interpreted-lambda lesson), with the masked-chunk list
    * materialized in its own column so sentinel ranks come from
    * array_position on an attribute.
    *
    * Returns (idCol, input, target, n_masked). */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
                  spanLen: Int = 3, ratePct: Int = 15): DataFrame = {
    require(spanLen >= 1, "spanLen must be positive")
    require(ratePct >= 0 && ratePct <= 100, "ratePct is a percentage")
    Seq("_sc_toks", "_sc_masked", "input", "target", "n_masked").foreach { c =>
      require(c != idCol, s"spanCorrupt reserves column $c — rename the id column")
      require(!df.columns.contains(c), s"spanCorrupt reserves column $c")
    }
    val t = TextStats.wsTrim(col(textCol))
    val toks = col("_sc_toks")
    val nChunks = ceil(size(toks) / lit(spanLen.toDouble)).cast("int")
    // deterministic per-(doc, chunk) draw in [0, 100)
    def draw(c: Column): Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":span:"),
        c.cast("string"))), 1, 2), 16, 10).cast("int") % 100
    // sequence(0, n-1) with n = 0 would generate DESCENDING [0, -1]
    // (Spark's default step is -1 when start > stop) — guard explicitly
    val chunkIdx = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    val masked = filter(chunkIdx, c => draw(c) < ratePct)
    val chunk: (Column => Column) =
      c => slice(toks, c * spanLen + 1, lit(spanLen))
    def sentinel(c: Column): Column =
      concat(lit("<extra_id_"),
        (array_position(col("_sc_masked"), c) - 1).cast("string"), lit(">"))
    df.withColumn("_sc_toks",
        when(t.isNull || t === "", array().cast("array<string>"))
          .otherwise(split(t, "\\s+")))
      .withColumn("_sc_masked", masked)
      .withColumn("input", concat_ws(" ", flatten(transform(
        chunkIdx,
        c => when(array_contains(col("_sc_masked"), c), array(sentinel(c)))
          .otherwise(chunk(c))))))
      .withColumn("target", concat_ws(" ", flatten(transform(
        col("_sc_masked"),
        c => concat(array(sentinel(c)), chunk(c))))))
      .withColumn("n_masked", size(col("_sc_masked")).cast("long"))
      .drop("_sc_toks", "_sc_masked")
  }

  private def reservePackCols(df: DataFrame, idCol: String): Unit =
    Seq("_ps_base", "_ps_n", "_ps_off", "_ps_idx", "_ps_local", "seq_id",
        "seq_ids", "n_ids").foreach { c =>
      require(c != idCol, s"packSequences reserves column $c — rename the id column")
      require(!df.columns.contains(c), s"packSequences reserves column $c")
    }

  private def packSequencesFrom(df: DataFrame, groupCols: Seq[String],
                                idCol: String, idsCol: String,
                                seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be positive")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offd = df
      .withColumn("_ps_n", size(col(idsCol)).cast("long"))
      .withColumn("_ps_off",
        col("_ps_base") + coalesce(sum(col("_ps_n")).over(w), lit(0L)))
    offd.select((gcols :+ col("_ps_off") :+ posexplode(col(idsCol))): _*)
      .withColumn("_ps_idx", col("_ps_off") + col("pos"))
      .withColumn("seq_id", floor(col("_ps_idx") / seqLen).cast("long"))
      .withColumn("_ps_local", (col("_ps_idx") % seqLen).cast("int"))
      .groupBy((gcols :+ col("seq_id")): _*)
      .agg(
        transform(
          array_sort(collect_list(struct(col("_ps_local"), col("col")))),
          s => s.getField("col")).as("seq_ids"),
        count(lit(1)).cast("long").as("n_ids"))
  }

  /** K-ANONYMITY AUDIT over a quasi-identifier tuple — the release gate
    * a dataset publisher runs beside PII redaction (x24): a row is
    * re-identifiable when its QI combination is shared by fewer than k
    * rows (Sweeney, IJUFKS 2002). Per group key: the QI-group census
    * (n_groups, the smallest group, how many groups sit under k) and
    * the ROW-level exposure — rows_at_risk and its exact Q20 fraction
    * risk_q20 = ⌊2²⁰·rows_at_risk/n⌋ (non-negative, bare floor-div) —
    * the number a release checklist actually gates on. NULL is a legal
    * QI value (it identifies like any other), so groups key on the raw
    * columns with no null filtering.
    *
    * 100 TB shape: ONE (keys, QI...)-keyed map-side-combining
    * aggregation reduces the corpus to QI-group counts; the audit is a
    * second aggregation on that (much smaller, but NOT censused —
    * worst case every row is its own group) frame. Both shuffles key
    * on real data columns; nothing collects. Group counts are SUMS
    * only across disjoint row shards (re-sum twins must shard by ROWS,
    * never mix partial groups of the same shard). Returns (keys..., n,
    * n_groups, min_group, groups_below_k, rows_at_risk, risk_q20). */
  def kAnonymityAudit(df: DataFrame, keyCols: Seq[String],
                      qiCols: Seq[String], k: Long): DataFrame = {
    require(keyCols.nonEmpty, "kAnonymityAudit needs >= 1 group key")
    require(qiCols.nonEmpty, "kAnonymityAudit needs >= 1 QI column")
    require(k >= 2, s"k must be >= 2 (k = 1 never flags): $k")
    val reserved = Seq("_kan_c", "n", "n_groups", "min_group",
      "groups_below_k", "rows_at_risk", "risk_q20")
    (keyCols ++ qiCols).foreach(c => require(!reserved.contains(c),
      s"kAnonymityAudit reserves column $c — rename it"))
    kAnonymityFromCounts(qiGroupCounts(df, keyCols, qiCols), keyCols, k)
  }

  /** The (keys, QI..., _kan_c) group-count table [[kAnonymityAudit]]
    * reduces the corpus to — exposed because counts are SUMS: per-batch
    * tables re-sum ([[mergeQiGroupCounts]]) into the one-shot table
    * bit-for-bit, the x98b staged-ingest convention. */
  def qiGroupCounts(df: DataFrame, keyCols: Seq[String],
                    qiCols: Seq[String]): DataFrame =
    df.groupBy((keyCols ++ qiCols).map(col): _*)
      .agg(count(lit(1)).as("_kan_c"))

  /** Merge [[kAnonymityAudit]] QI-group count tables by re-sum —
    * merged ≡ one-shot, PROVIDED the inputs shard by ROWS (each row of
    * the audited frame counted in exactly one table); partial counts
    * of the same shard must never mix twice. */
  def mergeQiGroupCounts(tables: Seq[DataFrame],
                         keyCols: Seq[String],
                         qiCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeQiGroupCounts needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy((keyCols ++ qiCols).map(col): _*)
      .agg(sum(col("_kan_c")).as("_kan_c"))
  }

  /** The audit half of [[kAnonymityAudit]] over a (keys, QI..., _kan_c)
    * group-count table (see there for the statistic and contracts). */
  def kAnonymityFromCounts(counts: DataFrame, keyCols: Seq[String],
                           k: Long): DataFrame = {
    require(keyCols.nonEmpty, "kAnonymityFromCounts needs >= 1 group key")
    require(k >= 2, s"k must be >= 2 (k = 1 never flags): $k")
    counts
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_kan_c")).as("n"),
        count(lit(1)).as("n_groups"),
        min(col("_kan_c")).as("min_group"),
        sum(when(col("_kan_c") < k, 1L).otherwise(0L))
          .as("groups_below_k"),
        sum(when(col("_kan_c") < k, col("_kan_c")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("risk_q20",
        expr("(1048576L * rows_at_risk) div n"))
  }

  /** L-DIVERSITY AUDIT — the attribute-disclosure gate k-anonymity
    * misses (Machanavajjhala et al., TKDD 2007): a QI group whose rows
    * all share one SENSITIVE value leaks that value even at group size
    * ≥ k, so the release gate also requires every group to carry at
    * least l DISTINCT sensitive values. Per group key: the group
    * census, the least-diverse group, how many groups sit under l, and
    * the row-level exposure (rows in under-diverse groups) with its
    * exact Q20 fraction — [[kAnonymityAudit]]'s report shape, one
    * audit column over. NULL is a legal QI value; a NULL sensitive
    * value counts as a value (it is what the release reveals).
    *
    * 100 TB shape: ONE (keys, QI..., sv)-keyed aggregation reduces the
    * corpus to sensitive cells, a second reduces cells to QI groups, a
    * third to the audit — three narrowing map-side-combining
    * aggregations, nothing collects. Returns (keys..., n, n_groups,
    * min_sv_distinct, groups_below_l, rows_at_risk, risk_q20). */
  def lDiversityAudit(df: DataFrame, keyCols: Seq[String],
                      qiCols: Seq[String], svCol: String,
                      l: Long): DataFrame = {
    require(keyCols.nonEmpty, "lDiversityAudit needs >= 1 group key")
    require(qiCols.nonEmpty, "lDiversityAudit needs >= 1 QI column")
    require(l >= 2, s"l must be >= 2 (l = 1 never flags): $l")
    val reserved = Seq("_ld_c", "_ld_n", "_ld_d", "n", "n_groups",
      "min_sv_distinct", "groups_below_l", "rows_at_risk", "risk_q20")
    (keyCols ++ qiCols :+ svCol).foreach(c => require(!reserved.contains(c),
      s"lDiversityAudit reserves column $c — rename it"))
    lDiversityFromCells(lDiversityCells(df, keyCols, qiCols, svCol),
      keyCols, qiCols, l)
  }

  /** The (keys, QI..., sv, _ld_c) sensitive-cell table [[lDiversityAudit]]
    * reduces the corpus to — exposed because cell counts are SUMS over
    * row shards: per-batch tables re-sum ([[mergeLDiversityCells]]) into
    * the one-shot table bit-for-bit (the distinct-sensitive census per
    * group is the merged table's cell COUNT — the set union of sensitive
    * values is exactly the union of cell keys), the x98b/x100d staged-
    * ingest convention. */
  def lDiversityCells(df: DataFrame, keyCols: Seq[String],
                      qiCols: Seq[String], svCol: String): DataFrame =
    df.groupBy(((keyCols ++ qiCols).map(col) :+ col(svCol)): _*)
      .agg(count(lit(1)).as("_ld_c"))

  /** Merge [[lDiversityCells]] tables by re-sum — merged ≡ one-shot,
    * PROVIDED the inputs shard by ROWS (each audited row counted in
    * exactly one table). */
  def mergeLDiversityCells(tables: Seq[DataFrame], keyCols: Seq[String],
                           qiCols: Seq[String], svCol: String): DataFrame = {
    require(tables.nonEmpty, "mergeLDiversityCells needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(((keyCols ++ qiCols).map(col) :+ col(svCol)): _*)
      .agg(sum(col("_ld_c")).as("_ld_c"))
  }

  /** The audit half of [[lDiversityAudit]] over a (keys, QI..., sv,
    * _ld_c) cell table (see there for the statistic and contracts); the
    * sensitive column itself never appears here — the distinct census
    * is the per-group cell count. */
  def lDiversityFromCells(cells: DataFrame, keyCols: Seq[String],
                          qiCols: Seq[String], l: Long): DataFrame = {
    require(keyCols.nonEmpty, "lDiversityFromCells needs >= 1 group key")
    require(l >= 2, s"l must be >= 2 (l = 1 never flags): $l")
    val groups = cells.groupBy((keyCols ++ qiCols).map(col): _*)
      .agg(sum(col("_ld_c")).as("_ld_n"), count(lit(1)).as("_ld_d"))
    groups.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_ld_n")).as("n"),
        count(lit(1)).as("n_groups"),
        min(col("_ld_d")).as("min_sv_distinct"),
        sum(when(col("_ld_d") < l, 1L).otherwise(0L)).as("groups_below_l"),
        sum(when(col("_ld_d") < l, col("_ld_n")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("risk_q20", expr("(1048576L * rows_at_risk) div n"))
  }

  /** T-CLOSENESS AUDIT — the distribution-disclosure gate l-diversity
    * misses (Li, Li & Venkatasubramanian, ICDE 2007): a group can be
    * l-diverse yet SKEWED (99% of its rows share one sensitive value
    * while the corpus is balanced), so the gate bounds the distance
    * between each QI group's sensitive-value distribution and the
    * whole key's, for ORDERED (integer) sensitive attributes by the
    * ordered-earth-mover distance of the paper:
    * D(P, Q) = (1/(m−1))·Σᵢ |CDF_P(vᵢ) − CDF_Q(vᵢ)| over the key's m
    * ordered sensitive values. Exact rationals end to end: the CDF gap
    * at vᵢ is |cumₚ·n − cum_q·n_g| / (n_g·n), summed as decimal(38,0),
    * ONE non-negative Q20 floor division per group at the very end —
    * oracle-replayable. m = 1 (a single sensitive value corpus-wide)
    * reads t = 0 for every group.
    *
    * 100 TB shape: one (keys, QI, sv) cell aggregation; the per-group
    * CDF runs on a DENSE (group × domain) frame — groups·m rows per
    * key — so the census is load-bearing: a raising FILTER gates the
    * group frame BEFORE the dense join (the kendall pre-censused
    * discipline; default 2²⁰ dense rows per key), and the CDF window
    * partitions by (keys, QI) — bounded by m, never global. Returns
    * (keys..., n, m, n_groups, max_t_q20, groups_above_t) with the
    * alert line at `tQ20` (default ⌊0.25·2²⁰⌋). */
  def tClosenessAudit(df: DataFrame, keyCols: Seq[String],
                      qiCols: Seq[String], svCol: String,
                      tQ20: Long = 262144L,
                      maxDense: Long = 1L << 20): DataFrame = {
    require(keyCols.nonEmpty, "tClosenessAudit needs >= 1 group key")
    require(qiCols.nonEmpty, "tClosenessAudit needs >= 1 QI column")
    require(tQ20 >= 0, s"tQ20 must be >= 0: $tQ20")
    require(maxDense >= 1 && maxDense <= (1L << 28),
      s"maxDense must be in [1, 2^28]: $maxDense")
    val reserved = Seq("_tc_sv", "_tc_c", "_tc_g", "_tc_n", "_tc_m",
      "_tc_ng", "_tc_gc", "_tc_gate", "_tc_cp", "_tc_cq", "_tc_s",
      "_tc_t", "n", "m", "n_groups", "max_t_q20", "groups_above_t")
    (keyCols ++ qiCols).foreach(c => require(!reserved.contains(c),
      s"tClosenessAudit reserves column $c — rename it"))
    tClosenessFromCells(tClosenessCells(df, keyCols, qiCols, svCol),
      keyCols, qiCols, tQ20, maxDense)
  }

  /** The (keys, QI..., _tc_sv, _tc_c) sensitive-cell table
    * [[tClosenessAudit]] reduces the corpus to — exposed because cell
    * counts are SUMS over row shards: per-batch tables re-sum
    * ([[mergeTClosenessCells]]) into the one-shot table bit-for-bit (the
    * key's global distribution and each group's are both re-aggregated
    * from cells downstream), the x98b/x100d staged-ingest convention.
    * Carries the audit's raise contracts: non-integer/NULL sensitive
    * values and NULL QI values raise HERE, at ingest time. */
  def tClosenessCells(df: DataFrame, keyCols: Seq[String],
                      qiCols: Seq[String], svCol: String): DataFrame = {
    require(keyCols.nonEmpty, "tClosenessCells needs >= 1 group key")
    require(qiCols.nonEmpty, "tClosenessCells needs >= 1 QI column")
    // integer ordered sensitive attribute (the kendall score contract)
    val sv = when(col(svCol).isNotNull && col(svCol).cast("long") === col(svCol),
        col(svCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"tClosenessAudit needs non-null integer sensitive values; " +
          s"$svCol = "), col(svCol).cast("string"))))
    // the dense frame is keyed by QI EQUALITY joins, where SQL NULL
    // never matches itself — a silent wrong-cell bug — so null QI
    // values raise loudly: normalize them to a sentinel first
    val qiSafe = qiCols.map(q => when(col(q).isNotNull, col(q))
      .otherwise(raise_error(lit(
        s"tClosenessAudit: QI column $q is NULL — coalesce to a sentinel "
          + "before auditing (equality joins cannot key on NULL)")))
      .as(q))
    df.select((keyCols.map(col) ++ qiSafe :+ sv.as("_tc_sv")): _*)
      .groupBy(((keyCols ++ qiCols).map(col) :+ col("_tc_sv")): _*)
      .agg(count(lit(1)).as("_tc_c"))
  }

  /** Merge [[tClosenessCells]] tables by re-sum — merged ≡ one-shot,
    * PROVIDED the inputs shard by ROWS (each audited row counted in
    * exactly one table). */
  def mergeTClosenessCells(tables: Seq[DataFrame], keyCols: Seq[String],
                           qiCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeTClosenessCells needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(((keyCols ++ qiCols).map(col) :+ col("_tc_sv")): _*)
      .agg(sum(col("_tc_c")).as("_tc_c"))
  }

  /** The audit half of [[tClosenessAudit]] over a (keys, QI..., _tc_sv,
    * _tc_c) cell table (see there for the statistic, the pre-censused
    * dense-frame gate, and the exact-rational EMD). */
  def tClosenessFromCells(cells: DataFrame, keyCols: Seq[String],
                          qiCols: Seq[String],
                          tQ20: Long = 262144L,
                          maxDense: Long = 1L << 20): DataFrame = {
    require(keyCols.nonEmpty, "tClosenessFromCells needs >= 1 group key")
    require(qiCols.nonEmpty, "tClosenessFromCells needs >= 1 QI column")
    require(tQ20 >= 0, s"tQ20 must be >= 0: $tQ20")
    require(maxDense >= 1 && maxDense <= (1L << 28),
      s"maxDense must be in [1, 2^28]: $maxDense")
    val glob = cells.groupBy((keyCols.map(col) :+ col("_tc_sv")): _*)
      .agg(sum(col("_tc_c")).as("_tc_g"))
    val gtot = glob.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_tc_g")).as("_tc_n"), count(lit(1)).as("_tc_m"))
    val grps = cells.groupBy((keyCols ++ qiCols).map(col): _*)
      .agg(sum(col("_tc_c")).as("_tc_ng"))
    // pre-censused gate: the dense frame is groups × m rows per key —
    // raise while PRODUCING the dense join's inputs, never after it
    val gate = grps.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_tc_gc")).join(gtot, keyCols)
      .select((keyCols.map(col) :+
        // decimal product: a long gc·m could overflow negative in
        // exactly the huge-frame regime this gate exists to catch
        when(col("_tc_gc").cast("decimal(38,0)") * col("_tc_m")
            <= lit(maxDense).cast("decimal(38,0)"), lit(true))
          .otherwise(raise_error(concat(
            lit(s"tClosenessAudit: dense frame exceeds maxDense=$maxDense"
              + " — bucket the sensitive attribute coarser; rows = "),
            (col("_tc_gc") * col("_tc_m")).cast("string"))))
          .as("_tc_gate")): _*)
    val gated = grps.join(gate, keyCols).filter(col("_tc_gate"))
      .drop("_tc_gate")
    // dense (group × domain) frame; absent cells read count 0
    val dense = gated.join(glob, keyCols)
      .join(cells, keyCols ++ qiCols :+ "_tc_sv", "left")
      .withColumn("_tc_c", coalesce(col("_tc_c"), lit(0L)))
      .join(gtot.select((keyCols.map(col) :+ col("_tc_n") :+
        col("_tc_m")): _*), keyCols)
    val w = Window.partitionBy((keyCols ++ qiCols).map(col): _*)
      .orderBy(col("_tc_sv"))
    val perGroup = dense
      .withColumn("_tc_cp", sum(col("_tc_c")).over(w))
      .withColumn("_tc_cq", sum(col("_tc_g")).over(w))
      .groupBy(((keyCols ++ qiCols).map(col) :+ col("_tc_ng") :+
        col("_tc_n") :+ col("_tc_m")): _*)
      .agg(sum(abs(col("_tc_cp").cast("decimal(38,0)") * col("_tc_n") -
        col("_tc_cq").cast("decimal(38,0)") * col("_tc_ng"))).as("_tc_s"))
      .withColumn("_tc_t", when(col("_tc_m") <= 1, lit(0L))
        // non-negative operands: trunc = floor in both engines
        .otherwise(expr("""cast((cast(1048576 as decimal(38,0)) * _tc_s)
             div (cast(_tc_ng as decimal(38,0)) * _tc_n * (_tc_m - 1))
           as bigint)""")))
    perGroup.groupBy(keyCols.map(col): _*)
      .agg(max(col("_tc_n")).as("n"), max(col("_tc_m")).as("m"),
        count(lit(1)).as("n_groups"),
        max(col("_tc_t")).as("max_t_q20"),
        sum(when(col("_tc_t") > tQ20, 1L).otherwise(0L))
          .as("groups_above_t"))
  }
}
