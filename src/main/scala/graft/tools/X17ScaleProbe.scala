package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

/** Scratch diagnostics: phase breakdown of the x17 chain (LSH pair
  * generation vs connected components) at two corpus scales, for the
  * round-14 rehearsal's super-linear finding. Not part of the API. */
object X17ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_rehearsal/x1_salt", "/tmp/graft_rehearsal/x10_salt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val t0 = System.nanoTime()
      val pairs = Dedup.lshCandidatePairs(
        Dedup.minhashSignature(
          spark.read.parquet(s"$dir/documents.parquet"), "text", 4),
        "doc_id", 4, 2)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nClusters = Dedup.dupClusters(pairs).count()
      val tCc = (System.nanoTime() - t1) / 1e9
      println(f"[x17probe] $dir pairs=$nPairs ${tPairs}%.1fs cc_rows=$nClusters ${tCc}%.1fs rounds=${Dedup.lastDupClusterRounds} converged=${Dedup.lastDupClusterConverged}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
