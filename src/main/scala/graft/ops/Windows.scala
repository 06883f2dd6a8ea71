package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ranking operators (SURVEY.md §2.7, W1–W3).
  *
  * The reference's order-sensitive logic (uniquify-suffix, first-of-group,
  * latest-file) requires an explicit ordering column in a distributed engine
  * (SURVEY.md §7.4) — callers pass the tiebreak column instead of relying on
  * encounter order.
  */
object Windows {

  /** W1 — uniquify-within-scope: duplicate names get `_1,_2,...` suffixes in
    * `orderCol` order. Ref: get_heal_platform_mds_data_dicts.py:358-400. */
  def uniquify(df: DataFrame, scopeCols: Seq[String], nameCol: String,
               orderCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy((scopeCols :+ nameCol).map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn(outCol,
        when(col("_rn") > 1, concat(col(nameCol), lit("_"), (col("_rn") - 1).cast("string")))
          .otherwise(col(nameCol)))
      .drop("_rn")
  }

  /** W2 — top-k per group by explicit ordering (deterministic tiebreak).
    * Ref: scripts/bdc/xml_generator.py:122 (first-of-group generalized). */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** W3 — latest/top-1 pick by sort order. Ref: scripts/bdc/ingest.sh:49,59
    * (`find | sort -r | head -n 1`). */
  def top1(df: DataFrame, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(1)
}
