package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SINGLE-PASS COLUMN PROFILING — the data-quality summary a pipeline
  * computes before trusting a new 100 TB drop (the Deequ use case):
  * per column, row/null/distinct counts and the top-K most frequent
  * values, exactly.
  *
  * Scale shape: the frame unpivots to (column, value) pairs IN the
  * projection (no join, no second scan — one pass over the data
  * whatever |cols| is), reduces in ONE map-side-combining aggregation
  * to the per-(column, value) count table, and every later step runs
  * on that table: the stats roll-up is a |cols|-row aggregate, and the
  * top-K uses the salted two-phase window ([[Scale.saltedTopK]]) so a
  * high-cardinality column (ids: every value distinct) spreads across
  * saltBuckets tasks instead of funneling one column's whole distinct
  * set through one window partition. Values compare AS STRINGS (cast
  * in the projection; profile string/integer columns — float render
  * differs across engines), ties in the top-K break value-ascending. */
object Profile {

  /** Profile `cols` of `df`: returns one row per column —
    * (column, n_rows, n_nulls, n_distinct, top_values) with top_values
    * the top-`topK` non-null values by (count desc, value asc),
    * pipe-joined in rank order (the P10 convention; empty string when
    * the column is all-NULL). */
  def profileColumns(df: DataFrame, cols: Seq[String], topK: Int = 3,
                     saltBuckets: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      s"cols must be non-empty and distinct: $cols")
    cols.foreach(c => require(df.columns.contains(c),
      s"profileColumns: no such column $c in ${df.columns.mkString(",")}"))
    require(topK >= 1, s"topK must be >= 1: $topK")
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*))
        .as("_pf"))
      .select(col("_pf.column").as("column"), col("_pf.v").as("_pf_v"))
    val vc = stacked.groupBy(col("column"), col("_pf_v"))
      .agg(count(lit(1)).as("_pf_c"))
    val stats = vc.groupBy(col("column")).agg(
      sum(col("_pf_c")).as("n_rows"),
      coalesce(sum(when(col("_pf_v").isNull, col("_pf_c"))), lit(0L))
        .as("n_nulls"),
      count(when(col("_pf_v").isNotNull, lit(1))).as("n_distinct"))
    val top = Scale.saltedTopK(vc.filter(col("_pf_v").isNotNull), "column",
        Seq(col("_pf_c").desc, col("_pf_v").asc), topK, saltBuckets)
      .groupBy(col("column"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("_pf_v").as("v")))),
        x => x.getField("v")), "|").as("top_values"))
    stats.join(top, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), coalesce(col("top_values"), lit("")).as("top_values"))
  }

  /** EQUI-WIDTH HISTOGRAM of an integer column — the distribution view
    * [[profileColumns]]'s scalar stats can't give (skew, modes, tail
    * mass before picking partition sizes or quality-score cuts).
    *
    * Integer-exact and engine-portable: bounds come from one (min, max)
    * aggregate; width = (max − min) div nBins + 1, so exactly ≤ nBins
    * buckets cover the range and max lands inside the last one; bin =
    * (v − min) div width — every step integer floor-division on
    * non-negative values (x85 replays it verbatim). NULLs are excluded
    * (they are [[profileColumns]]'s n_nulls, not a bin). Empty bins are
    * absent rows (a 100 TB histogram materializes observed bins only).
    *
    * Scale shape: the bounds aggregate is one row and folds back as a
    * broadcast; the counts are ONE map-side-combining groupBy on a
    * small-int bin key. Counts are sums, so histograms over shards with
    * SHARED bounds merge by re-sum (the [[graft.ext.Sketch]] property);
    * pass the bounds explicitly via `fixedBounds` for that use.
    *
    * Returns (bin, lo, hi, c) — lo/hi the inclusive value range of the
    * bin — ordered by nothing (sort at render). */
  def histogram(df: DataFrame, valueCol: String, nBins: Int,
                fixedBounds: Option[(Long, Long)] = None): DataFrame = {
    require(nBins >= 1 && nBins <= (1 << 20),
      s"nBins must be in [1, 2^20]: $nBins")
    // no reserved-name contract needed: the input is projected to an
    // internal name before any output column exists
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_hg_v"))
    val bounds = fixedBounds match {
      case Some((mn, mx)) =>
        require(mn <= mx, s"fixedBounds needs mn <= mx: ($mn, $mx)")
        vals.sparkSession.range(1)
          .select(lit(mn).as("_hg_mn"), lit(mx).as("_hg_mx"))
      case None =>
        vals.agg(min(col("_hg_v")).as("_hg_mn"), max(col("_hg_v")).as("_hg_mx"))
    }
    vals.crossJoin(broadcast(bounds))
      .withColumn("_hg_w", expr(s"(_hg_mx - _hg_mn) div ${nBins}L + 1L"))
      // out-of-bounds under fixedBounds raises PER ROW: a negative
      // (v − mn) would hit div's trunc-vs-floor divergence and a silent
      // clamp would fake the tail — loud beats both
      .withColumn("bin",
        when(col("_hg_v") >= col("_hg_mn") && col("_hg_v") <= col("_hg_mx"),
          expr("(_hg_v - _hg_mn) div _hg_w"))
          .otherwise(raise_error(concat(
            lit(s"histogram: $valueCol value outside bounds: "),
            col("_hg_v").cast("string")))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c"),
        min(expr("_hg_mn + bin * _hg_w")).as("lo"),
        min(expr("_hg_mn + (bin + 1) * _hg_w - 1")).as("hi"))
      .select(col("bin"), col("lo"), col("hi"), col("c"))
  }
}
