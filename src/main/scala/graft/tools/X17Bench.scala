package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

/** Throwaway A/B harness for dupClusters fusion (not part of the API). */
object X17Bench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs = Dedup.lshCandidatePairs(
      Dedup.minhashSignature(
        spark.read.parquet(s"$dir/documents.parquet"), "text", 4),
      "doc_id", 4, 2)
    for (steps <- Seq(1, 2, 3, 1, 2, 3)) {
      val t0 = System.nanoTime()
      Dedup.dupClusters(pairs, stepsPerRound = steps).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"RESULT steps=$steps time=$dt%.2f rounds=${Dedup.lastDupClusterRounds} converged=${Dedup.lastDupClusterConverged}")
    }
    spark.stop()
  }
}
