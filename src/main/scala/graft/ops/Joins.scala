package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.5, J1–J8) + set ops (§2.9, U1–U4).
  *
  * Every join in the reference is an equi-join on study/variable ids with a
  * small build side (≤ thousands of studies), so the idiomatic physical plan
  * is a broadcast hash join; helpers take a `smallSide` flag to hint
  * `broadcast()` explicitly rather than relying on autoBroadcastJoinThreshold
  * (at 100 TB the fact side is huge while the metadata side stays small, so
  * the hint holds at scale).
  */
object Joins {

  /** J1/J2 — keyed equi-join with small (metadata) right side broadcast.
    * Ref: scripts/bdc/xml_generator.py:217-236 (per-study loop == inner
    * hash join), :17-23 (set_index + .loc == keyed lookup). */
  def broadcastEquiJoin(big: DataFrame, small: DataFrame, cond: Column,
                        joinType: String = "inner"): DataFrame =
    big.join(broadcast(small), cond, joinType)

  /** J4 — static-map enrichment from a tiny mapping table.
    * Ref: get_heal_platform_mds_data_dicts.py:635-644,672-675. */
  def enrich(df: DataFrame, mapping: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    df.join(broadcast(mapping), Seq(key), joinType)

  /** J5 — semi-join (id-set intersection probe).
    * Ref: run_dbgap_xml_gen_fallback.py:87-111. */
  def semi(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_semi")

  /** J6 — anti-join (id-set difference).
    * Ref: get_heal_platform_mds_data_dicts.py:97-106,229-249. */
  def anti(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_anti")

  /** J8 — prefix-scan membership: harvest values with `prefix` from ANY of
    * the given columns, normalize to a key (first dot-part), dedupe, then
    * semi-join `target` on it. Ref: run_dbgap_xml_gen_fallback.py:97-104
    * (phs* ids scraped from arbitrary PicSure columns ∩ Gen3 ids). */
  def prefixScanMembership(source: DataFrame, scanCols: Seq[String], prefix: String,
                           target: DataFrame, targetKey: String): DataFrame = {
    val harvested = source
      .select(explode(array(scanCols.map(c => col(c).cast("string")): _*)).as("v"))
      .filter(col("v").startsWith(prefix))
      .select(substring_index(col("v"), ".", 1).as(targetKey))
      .distinct()
    target.join(harvested, Seq(targetKey), "left_semi")
  }

  /** As-of join (beyond-reference; the canonical "operator Spark lacks"):
    * each left row is joined to the LATEST right row with the same key and
    * right.ts <= left.ts (left outer: no match → nulls).
    *
    * Composed from existing operators — tag the sides, union, and carry
    * the right payload forward with a `last(_, ignoreNulls)` window
    * ordered by (ts, side) with right rows sorting first at equal ts
    * (ASOF `>=` semantics). ONE shuffle on the join key, rows carried
    * once each: no range-join pair explosion, no per-row probe. The right
    * payload travels as a single struct so a partial-null right row can
    * never mix fields from different matches.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate otherwise
    * (matches the engine-native ASOF contract in e.g. DuckDB, whose ASOF
    * JOIN is this operator's oracle). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // fail fast instead of silently emitting ambiguous/duplicate columns
    val internal = Set("_k", "_ts", "_side", "_l", "_r", "_match")
    val clashes = (leftCols ++ right.columns).filter(internal)
    require(clashes.isEmpty,
      s"asofJoin reserves internal column names ${internal.mkString(", ")}; " +
        s"rename input columns: ${clashes.distinct.mkString(", ")}")
    val dupOut = rightCols.filter(leftCols.contains)
    require(dupOut.isEmpty,
      "asofJoin output would carry duplicate column names (rightCols ∩ " +
        s"left columns): ${dupOut.mkString(", ")} — alias one side first")
    val rStruct = struct(rightCols.map(col): _*)
    val lNorm = left.select(
      col(key).as("_k") +: col(ts).as("_ts") +: lit(1).as("_side") +:
        struct(leftCols.map(col): _*).as("_l") +:
        Seq(lit(null).cast(right.select(rightCols.map(col): _*).schema)
          .as("_r")): _*)
    val rNorm = right.select(
      col(key).as("_k") +: col(ts).as("_ts") +: lit(0).as("_side") +:
        lit(null).cast(left.schema).as("_l") +:
        Seq(rStruct.as("_r")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col("_ts"), col("_side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Scale-safe interval/range join (beyond-reference): point `pt` matches
    * range [lo, hi). The naive theta-join plans a nested-loop (every point
    * scans every range — quadratic at scale). Bucketing turns it into an
    * EQUI-join: each range replicates to the fixed-width buckets it
    * covers, each point probes exactly its own bucket; shuffle volume is
    * O(points + Σ span/width) and the bucket-local refinement keeps only
    * true containment. Pick `bucketWidth` near the typical range span so
    * replication stays O(1) per range. */
  def bucketedRangeJoin(points: DataFrame, ranges: DataFrame, ptCol: String,
                        loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    val pb = points.withColumn("_bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    val rb = ranges.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(rb, Seq("_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_bucket")
  }

  /** J7 — fallback dispatch as a full outer join: rows present only on the
    * left are 'left_only', only right 'right_only', both 'both' — the
    * reference's download-vs-generate method/status bookkeeping.
    * Ref: run_dbgap_xml_gen_fallback.py:243-398. */
  def outerDispatch(left: DataFrame, right: DataFrame, key: String,
                    leftTag: String = "left_only", rightTag: String = "right_only",
                    bothTag: String = "both"): DataFrame = {
    val l = left.select(col(key).as("l_key"))
    val r = right.select(col(key).as("r_key"))
    l.join(r, col("l_key") === col("r_key"), "full_outer")
      .select(
        coalesce(col("l_key"), col("r_key")).as(key),
        when(col("r_key").isNull, lit(leftTag))
          .when(col("l_key").isNull, lit(rightTag))
          .otherwise(lit(bothTag)).as("method"))
  }
}
