package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGEABLE SKETCHES for corpus-scale statistics — the third leg of the
  * approximate family beside LSH buckets (dedup) and IVF cells (ANN):
  * fixed-size summaries whose cells are plain aggregates (SUM / MAX), so
  * they combine map-side, merge across shards/batches by construction,
  * and — because every hash is an md5 derivation, never a seeded RNG —
  * replay BIT-FOR-BIT in any engine. That determinism is the house
  * discipline (bloomPositions, SimHash, the salted draws): the sketch's
  * approximation ERROR is itself oracle-checkable, not just bounded on
  * paper.
  *
  * Count–min sketch: frequency estimation / heavy hitters over an
  * unbounded value stream in depth×width cells (overestimates only).
  * HyperLogLog: distinct-count estimation in 2^p max-registers with the
  * standard bias correction and linear-counting small-range arm, all in
  * exact integer arithmetic (the α ratio is rational; the small-range
  * ln uses the Q8 integer log₂ shared with the tokenizer trainers and
  * an ln 2 Q20 constant — a documented, deterministic approximation of
  * the float formula, NOT a float).
  */
object Sketch {

  /** md5-derived count–min position of `item` for hash row h: first 5
    * md5 hex digits of "item:cms:h" mod width — the bloomPositions
    * derivation, 20 bits, replayed in SQL by the same nibble chain. */
  private def cmsPos(item: Column, h: Int, width: Int): Column =
    conv(substring(md5(concat(item, lit(s":cms:$h"))), 1, 5), 16, 10)
      .cast("long") % width

  /** Build a COUNT–MIN SKETCH over a value stream: `depth` hash rows ×
    * `width` counters, stored as DATA — (row, pos, c) cells, at most
    * depth·width rows regardless of stream size. One explode (×depth)
    * and ONE map-side-combining aggregation; the stream never shuffles
    * anything but 20-bit cell coordinates. Cells are sums, so sketches
    * over shards/batches merge by unioning cells and re-summing —
    * the mergeability that makes the sketch a streaming/incremental
    * citizen. NULL values are skipped (a count sketch has no null key).
    */
  def cmsSketch(values: DataFrame, valueCol: String,
                width: Int, depth: Int): DataFrame = {
    require(width >= 1 && width <= (1 << 20),
      s"width must be in [1, 2^20]: $width")
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16]: $depth")
    values.select(col(valueCol).cast("string").as("_cm_v"))
      .filter(col("_cm_v").isNotNull)
      .select(explode(array((0 until depth).map { h =>
        struct(lit(h).cast("int").as("row"),
          cmsPos(col("_cm_v"), h, width).as("pos"))
      }: _*)).as("_cm_rp"))
      .groupBy(col("_cm_rp.row").as("row"), col("_cm_rp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate stream counts for candidate values against a built
    * [[cmsSketch]]: est(v) = min over the depth rows of cell(row,
    * pos_row(v)) — the count–min guarantee: est ≥ true count always
    * (no cell ever undercounts), overestimates only from collisions.
    * The sketch BROADCASTS (≤ depth·width cells — boundedness is the
    * point); candidates dedupe and explode ×depth, so the probe is one
    * broadcast equi-join + one min aggregation, independent of the
    * original stream's size. A cell no candidate hashed to reads 0
    * (a never-seen value estimates its true count, 0). Returns
    * (value, est). */
  def cmsEstimate(candidates: DataFrame, sketch: DataFrame, valueCol: String,
                  width: Int, depth: Int): DataFrame = {
    require(width >= 1 && width <= (1 << 20),
      s"width must be in [1, 2^20]: $width")
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16]: $depth")
    Seq("row", "pos", "c").foreach(c => require(sketch.columns.contains(c),
      s"sketch must carry (row, pos, c) cells — missing $c"))
    candidates.select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
      .select(col("value"), explode(array((0 until depth).map { h =>
        struct(lit(h).cast("int").as("row"),
          cmsPos(col("value"), h, width).as("pos"))
      }: _*)).as("_cm_rp"))
      .select(col("value"), col("_cm_rp.row").as("row"),
        col("_cm_rp.pos").as("pos"))
      .join(broadcast(sketch.select(col("row"), col("pos"), col("c"))),
        Seq("row", "pos"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Merge count–min cell tables (shards, batches, streaming
    * micro-batches) by cell re-sum — the merged sketch is EXACTLY the
    * one-shot sketch of the concatenated streams (cells are sums;
    * SketchSpec pins the equality), which is what makes the sketch a
    * continuous-ingest citizen: the base corpus is summarized once and
    * never rescanned. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("pos")).agg(sum(col("c")).as("c"))
  }

  /** Merge HLL register tables by re-max — exactly the one-shot
    * registers of the concatenated streams (registers are maxes). */
  def hllMerge(registers: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(registers.nonEmpty, "hllMerge needs at least one register table")
    registers.reduce(_ unionByName _)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))
  }

  /** Stage a sketch/register table to parquet — the persisted
    * continuous-ingest artifact a later batch merges into — and read it
    * back. Unique per-invocation dir (no cross-session overwrite
    * races), registered for deletion at JVM exit. The write runs at
    * construction time, the lshCandidatePairsStaged convention. */
  private def stage(df: DataFrame, prefix: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Dedup.registerStageDirForCleanup(dir.toString)
    df.write.mode("overwrite").parquet(dir.toString)
    df.sparkSession.read.parquet(dir.toString)
  }

  /** [[cmsSketch]] staged to parquet — the base-corpus summary. */
  def cmsSketchStaged(values: DataFrame, valueCol: String,
                      width: Int, depth: Int): DataFrame =
    stage(cmsSketch(values, valueCol, width, depth), "graft_cms_stage_")

  /** [[hllRegisters]] staged to parquet — the base-corpus state. */
  def hllRegistersStaged(df: DataFrame, keyCols: Seq[String],
                         valueCol: String, p: Int): DataFrame =
    stage(hllRegisters(df, keyCols, valueCol, p), "graft_hll_stage_")

  /** md5-derived 48-bit KMV hash of a value: the first 12 md5 hex digits
    * of "v:kmv" as a long — uniform on [0, 2⁴⁸), independent of the cms
    * and bloom chains by the salt, replayed in SQL by the 12-nibble
    * positional chain (x82). */
  private def kmvHash(v: Column): Column =
    conv(substring(md5(concat(v, lit(":kmv"))), 1, 12), 16, 10).cast("long")

  /** K-MINIMUM-VALUES (bottom-k / theta-style) sketch state over a value
    * stream: the k SMALLEST distinct 48-bit hashes, as DATA — ≤ k rows of
    * (h). The third sketch beside count–min (frequency) and HLL
    * (distinct): KMV's state is a uniform SAMPLE of the distinct-value
    * hash space, so states over different corpora compose into SET
    * estimates — union, intersection, Jaccard (Beyer et al., SIGMOD'07,
    * "On synopses for distinct value estimation under multiset
    * operations") — which neither of the other two can answer. That is
    * the cheap cross-corpus overlap probe (train×eval contamination
    * rate, crawl-vs-crawl novelty) that runs on 2·k longs instead of a
    * full gram join.
    *
    * Plan: one hash-key distinct (map-side partial dedup — only 8-byte
    * hashes ever cross the exchange, never values) + a TakeOrdered k
    * (per-partition bottom-k, merged once). States over shards/batches
    * merge by re-bottom-k ([[kmvMerge]]; SketchSpec pins merge ≡
    * one-shot). NULL values are skipped. */
  def kmvState(values: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 16), s"k must be in [2, 2^16]: $k")
    values.filter(col(valueCol).isNotNull)
      .select(kmvHash(col(valueCol).cast("string")).as("h"))
      .distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Merge KMV states (shards, batches) by re-bottom-k: bottom-k of the
    * union of bottom-k samples IS the bottom-k of the union — the k
    * smallest hashes of A ∪ B are each within the k smallest of their
    * own side — so the merged state equals the one-shot state
    * bit-for-bit (SketchSpec pins it). */
  def kmvMerge(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "kmvMerge needs at least one state")
    require(k >= 2 && k <= (1 << 16), s"k must be in [2, 2^16]: $k")
    states.reduce(_ unionByName _).distinct().orderBy(col("h")).limit(k)
  }

  /** [[kmvState]] staged to parquet — the base-corpus sample a later
    * batch merges into without rescanning the base. */
  def kmvStateStaged(values: DataFrame, valueCol: String, k: Int): DataFrame =
    stage(kmvState(values, valueCol, k), "graft_kmv_stage_")

  /** Cross-corpus overlap from two [[kmvState]] frames ALONE (the
    * corpora themselves are never touched): one row
    * (k_eff, j_num, union_est, inter_est).
    *
    *  - L = bottom-k of the union of the two states; k_eff = |L| ≤ k.
    *  - union_est: while k_eff < k the union sample is COMPLETE, so the
    *    estimate is the exact k_eff; otherwise the classic order-
    *    statistic estimate (k−1)·2⁴⁸ div (h₍ₖ₎+1) — one decimal(38,0)
    *    floor division, deterministic because the hash is md5-derived.
    *  - j_num = |{h ∈ L : h ∈ A ∧ h ∈ B}| — L is a uniform sample of
    *    the union, so j_num/k_eff estimates the Jaccard similarity.
    *  - inter_est = j_num·union_est div k_eff — exact in the small
    *    regime (there j_num IS the intersection count and union_est =
    *    k_eff).
    *
    * Plan: both states and L are ≤ k rows — two broadcast membership
    * joins + one single-row aggregate; nothing here scales with corpus
    * size. */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 16), s"k must be in [2, 2^16]: $k")
    Seq(a, b).foreach(s => require(s.columns.contains("h"),
      "kmvOverlap takes kmvState frames (column h)"))
    val l = kmvMerge(Seq(a, b), k)
    val flags = l
      .join(broadcast(a.select(col("h")).withColumn("_kv_a", lit(1))),
        Seq("h"), "left")
      .join(broadcast(b.select(col("h")).withColumn("_kv_b", lit(1))),
        Seq("h"), "left")
    flags.agg(count(lit(1)).as("k_eff"), max(col("h")).as("_kv_hk"),
        coalesce(sum(when(col("_kv_a") === 1 && col("_kv_b") === 1, 1L)),
          lit(0L)).as("j_num"))
      .withColumn("union_est",
        when(col("k_eff") < k, col("k_eff")).otherwise(expr(
          s"cast((${k - 1}L * cast(281474976710656 as decimal(38,0)))" +
            " div (_kv_hk + 1L) as bigint)")))
      .select(col("k_eff"), col("j_num"), col("union_est"),
        when(col("k_eff") === 0L, lit(0L)).otherwise(expr(
          "cast((cast(j_num as decimal(38,0)) * union_est) div k_eff" +
            " as bigint)")).as("inter_est"))
  }

  /** HYPERLOGLOG registers over a (grouped) value stream: per group key,
    * 2^p max-registers as DATA — (keys..., bucket, reg). The 60-bit
    * value hash is the first 15 md5 hex digits (the SimHash hash); the
    * top p bits pick the bucket, the register is the leading-zero rank
    * of the remaining 60−p bits (+1; an all-zero rest reads the maximum
    * 61−p). Registers are MAX aggregates: shard/batch register tables
    * union and re-max into the whole-corpus state (SketchSpec pins the
    * merge ≡ one-shot equality), and the map-side partial max means the
    * stream's distinct values never cross the exchange — only (key,
    * bucket ≤ 2^p, reg ≤ 61−p) rows do. NULL values are skipped. */
  def hllRegisters(df: DataFrame, keyCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4, 14]: $p")
    val reserved = Seq("bucket", "reg", "_hl_h", "_hl_r")
    reserved.foreach(c => require(!keyCols.contains(c) && c != valueCol,
      s"hllRegisters reserves column $c — rename it"))
    val restBits = 60 - p
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val rest = h.bitwiseAND(lit((1L << restBits) - 1))
    val rank = when(rest === 0L, lit((restBits + 1).toLong))
      .otherwise(lit((restBits + 1).toLong) - length(bin(rest)).cast("long"))
    df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+
        call_function("shiftright", h, lit(restBits)).as("bucket") :+
        rank.as("reg")): _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))
  }

  /** Estimate per-group distinct counts from [[hllRegisters]] state, in
    * EXACT integer arithmetic. Raw estimate = α_m·m²/Σ 2^(−M_j) with
    * the sum over all m registers (absent buckets read 0) evaluated at
    * the common scale 2^(61−p), and α_m = 0.7213/(1 + 1.079/m) kept as
    * the exact rational 7213000·m / (10000·(1000m + 1079)) — ONE
    * decimal(38,0) floor division per group. The standard small-range
    * arm: when observed buckets V < m and raw ≤ 5m/2, linear counting
    * m·ln(m/Z) over the EMPTY-register count Z = m − V evaluates as
    * m·(log₂m − log₂Z)·ln2 over the Q8 integer
    * log (Unigram.log2q8 — the tokenizer trainers' arithmetic) and
    * ln 2 as the Q20 constant 726817 — deterministic in any engine,
    * which is what keeps the small-range arm oracle-checkable. Returns
    * (keys..., est); accuracy ~1.04/√m relative (SketchSpec pins the
    * deterministic observed error). Large-range correction is omitted:
    * it engages near 2^60/30 distincts — beyond any corpus. */
  def hllEstimate(registers: DataFrame, keyCols: Seq[String],
                  p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4, 14]: $p")
    val m = 1L << p
    val maxRank = 61 - p
    // α_m numerator folded with m²·2^(61−p): one decimal literal
    val estNum = BigInt(7213000) * BigInt(m) * BigInt(m) * BigInt(m) *
      (BigInt(1) << maxRank)
    val alphaDen = BigInt(10000) * (BigInt(1000) * m + 1079)
    val g = registers
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_hl_v"),
        sum(call_function("shiftleft", lit(1L),
          (lit(maxRank.toLong) - col("reg")).cast("int"))).as("_hl_s"))
      .withColumn("_hl_sn",
        expr(s"_hl_s + shiftleft(${m}L - _hl_v, $maxRank)"))
      .withColumn("_hl_raw",
        expr(s"cast($estNum div ($alphaDen * cast(_hl_sn as decimal(38,0))) " +
          "as bigint)"))
      // log₂ of the EMPTY-register count; at V = m the expression reads
      // log2q8(0) = 0 harmlessly — that branch never selects (V < m)
      .withColumn("_hl_lg", Unigram.log2q8(lit(m) - col("_hl_v")))
    g.withColumn("est",
        when(col("_hl_v") < m && col("_hl_raw") * 2L <= 5L * m,
          expr(s"(${m}L * (${p * 256}L - _hl_lg) * 726817L) div 268435456L"))
          .otherwise(col("_hl_raw")))
      .select((keyCols.map(col) :+ col("est")): _*)
  }
}
