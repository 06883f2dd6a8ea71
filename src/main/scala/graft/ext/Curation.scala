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
}
