package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ext.Dedup

/** Throwaway A/B harness for the x23 bloom pre-filter (not part of the
  * API): same decontamination query with and without the
  * bloom_filter_might_contain probe on the exploded train-gram stream,
  * interleaved to cancel JVM warmup drift. */
object X23Bench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // same shape as the x23 driver query: eval = doc_id < 10
    val train = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    for (bloom <- Seq(true, false, true, false, true, false)) {
      val t0 = System.nanoTime()
      val n = Dedup.contaminatedDocs(train, bench, "text", "doc_id", 3,
        bloomPreFilter = bloom).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"RESULT bloom=$bloom time=$dt%.2f rows=$n")
    }
    spark.stop()
  }
}
