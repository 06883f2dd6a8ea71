package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextStats

/** Throwaway A/B harness for the x31 scorer (not part of the API): the
  * fused native HashedLinearScoreQ30 expression vs the equivalent
  * column composition (split → transform(md5/conv/element_at) →
  * aggregate), interleaved to cancel JVM warmup drift. Both produce
  * identical sums (property-tested); this measures the plan cost only. */
object X31Bench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ws = TextStats.seededWeightsQ30(64)
    for (i <- 1 to reps; native <- Seq(true, false)) {
      val score =
        if (native) TextStats.hashedLinearScoreQ30Fast(col("text"), ws)
        else TextStats.hashedLinearScoreQ30(col("text"), ws)
      val t0 = System.nanoTime()
      val s = docs.agg(sum(score)).head().getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"RESULT rep=$i native=$native time=$dt%.3f sum=$s")
    }
    spark.stop()
  }
}
