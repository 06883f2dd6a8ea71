package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.6, A1–A9).
  *
  * All are plain hash-aggregates: Catalyst plans partial (map-side) +
  * final aggregation automatically, so at 100 TB each of these is a single
  * shuffle on the grouping key with map-side combine — nothing to hand-tune
  * beyond key skew (not present for these metadata-ish keys).
  *
  * Determinism note: the reference uses encounter-order "first of group"
  * (pandas `.iloc[0]`). Spark's `first()` is nondeterministic post-shuffle,
  * so this library uses order-free `min`/`max` for oracle-checked paths;
  * where encounter order must be reproduced use `Windows.topKPerGroup`
  * with an explicit ordering column (SURVEY.md §7.4).
  */
object Aggs {

  /** A1 — duplicate detection: keys occurring more than once.
    * Ref: get_bdc_studies_from_gen3.py:74-82. */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** A2 — distinct counts. Ref: get_bdc_studies_md_from_picsure.py:94-103. */
  def distinctCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(countDistinct(col(cols.head)).as(s"n_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"n_$c")): _*)

  /** A4 — status breakdown report: counts per status/method bucket.
    * Ref: run_dbgap_xml_gen_fallback.py:80-147. */
  def breakdown(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** A5 — group-to-document: one row per group with group attrs + member
    * list. `min` stands in for the reference's first-row attrs to stay
    * deterministic. Ref: scripts/bdc/xml_generator.py:111-162,201-212. */
  def groupToDoc(df: DataFrame, key: String, attrCol: String, memberCol: String): DataFrame =
    df.groupBy(col(key)).agg(
      min(col(attrCol)).as(attrCol),
      count(lit(1)).as("n_members"),
      concat_ws(",", array_sort(collect_list(col(memberCol).cast("string")))).as("members"))

  /** A6 — coalesce-key section grouping (section→module→dd_id→"none").
    * Ref: generate_lakefs_dbgap_xml_index.py:136-168. */
  def sectionGroup(df: DataFrame, fallback: String, keyCandidates: Column*): DataFrame =
    df.groupBy(coalesce(keyCandidates.map(c => nullif(c, lit(""))) :+ lit(fallback): _*)
        .as("section"))
      .agg(count(lit(1)).as("n"))

  /** A7 — two-level roll-up with subtotal rows.
    * Ref: generate_lakefs_dbgap_xml_index.py:271-291. */
  def rollupCounts(df: DataFrame, k1: String, k2: String): DataFrame =
    df.rollup(col(k1), col(k2)).agg(count(lit(1)).as("n"))

  /** A8 — dedup-consolidate: collapse rows sharing `baseKey` to one winner
    * (deterministic: smallest `orderCol`), collecting the collapsed values.
    * Ref: get_bdc_studies_from_gen3.py:329-352 (consent-collapse). */
  def dedupConsolidate(df: DataFrame, baseKey: String, orderCol: String,
                       collectCol: String): DataFrame =
    df.groupBy(col(baseKey)).agg(
      min(col(orderCol)).as(orderCol),
      concat_ws("|", array_sort(collect_set(col(collectCol)))).as(s"all_$collectCol"))

  /** §3.3 pivot — repository columns from rows, as conditional aggregation
    * (works identically in any ANSI engine and keeps column names stable).
    * Ref: generate_lakefs_dbgap_xml_index.py:266-291. */
  def manualPivot(df: DataFrame, groupKey: String, pivotKey: String,
                  pivotValues: Seq[String]): DataFrame =
    df.groupBy(col(groupKey)).agg(
      sum(when(col(pivotKey) === pivotValues.head, 1L).otherwise(0L))
        .as(pivotValues.head),
      pivotValues.tail.map(v =>
        sum(when(col(pivotKey) === v, 1L).otherwise(0L)).as(v)): _*)
}
