package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for the 100 TB posture (SURVEY.md §7.1).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these are
  * the *plan-level* tools for the cases AQE can't fix: skewed aggregation
  * keys (one hot study/language/band dominating a partition) and repeated
  * large-large joins on the same key (bucketing).
  */
object Scale {

  /** Two-phase salted aggregation for skewed grouping keys: phase 1
    * aggregates on (key, salt) — spreading a hot key over `saltBuckets`
    * reducers — phase 2 merges the partials. Caller supplies per-phase
    * aggregate pairs: (partial expr over input, merge expr over partial).
    *
    * Example — skew-proof count + sum:
    * {{{
    * Scale.saltedAgg(df, Seq("lang"), 16)(
    *   Seq(count(lit(1)).as("n") -> sum(col("n")).as("n"),
    *       sum(col("v")).as("s") -> sum(col("s")).as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      phases: Seq[(Column, Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(phases.head._1, phases.tail.map(_._1): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(phases.head._2, phases.tail.map(_._2): _*)
  }

  /** Salted join for a skewed big side against a small-but-not-broadcastable
    * build side: big rows keep their salt, the build side is replicated
    * `saltBuckets` times, and the join key becomes (key, salt). Shuffle
    * spreads each hot key across `saltBuckets` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((saltBuckets - 1).toLong))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed on the join key so later joins of these
    * tables are exchange-free (co-located scan + merge). Bucketed tables
    * require the table catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Pre-shuffle both sides to the same partitioning once, reuse across
    * several joins/aggs on that key in one job (exchange reuse). */
  def coPartition(dfs: Seq[DataFrame], key: String, n: Int): Seq[DataFrame] =
    dfs.map(_.repartition(n, col(key)))

  /** Range-partitioned, sorted-within-file layout: global range split
    * across files + in-file ordering ⇒ every file (and every parquet row
    * group inside it) covers a DISJOINT key range, so a read with a key
    * predicate prunes to the few files/row groups overlapping it via
    * parquet min/max stats. The standard data-layout move when one filter
    * key dominates read patterns at 100 TB (the poor man's Z-order for a
    * single key). */
  def writeRangeSorted(df: DataFrame, path: String, key: String,
                       nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)
}
